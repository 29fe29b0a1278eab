package graft

import java.io.File
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import org.apache.avro.{Schema, SchemaBuilder}
import org.apache.avro.file.DataFileWriter
import org.apache.avro.generic.{GenericData, GenericDatumWriter, GenericRecord}

import graft.sql.GraftContext

/** Read-only Iceberg scan (`graft.sources.IcebergScan`) against a
  * spec-shaped fixture generated in-test: parquet data files + Avro
  * manifest / manifest-list + `metadata.json`, the same metadata layer the
  * reference consumes via `StaticTable::from_metadata_file` (reference
  * `src/catalog/metastore.rs:237-246`, `src/context/iceberg.rs`).
  */
class IcebergSpec extends SparkSpec {

  // --- fixture builders ----------------------------------------------------

  private val dataFileSchema: Schema = SchemaBuilder.record("r2_data_file").fields()
    .requiredInt("content")
    .requiredString("file_path")
    .requiredString("file_format")
    .name("equality_ids").`type`().optional().array().items().intType()
    .endRecord()

  private val manifestEntrySchema: Schema = SchemaBuilder.record("manifest_entry").fields()
    .requiredInt("status")
    .name("sequence_number").`type`().optional().longType()
    .name("data_file").`type`(dataFileSchema).noDefault()
    .endRecord()

  private val manifestFileSchema: Schema = SchemaBuilder.record("manifest_file").fields()
    .requiredString("manifest_path")
    .requiredInt("content")
    .endRecord()

  private def writeAvro(path: String, schema: Schema, records: Seq[GenericRecord]): Unit = {
    val w = new DataFileWriter[GenericRecord](new GenericDatumWriter[GenericRecord](schema))
    w.create(schema, new File(path))
    try records.foreach(w.append) finally w.close()
  }

  private def dataFileRecord(path: String, content: Int = 0, format: String = "PARQUET",
                             seq: Long = -1L, eqIds: Seq[Int] = Nil) = {
    val df = new GenericData.Record(dataFileSchema)
    df.put("content", content)
    df.put("file_path", path)
    df.put("file_format", format)
    if (eqIds.nonEmpty) {
      import scala.jdk.CollectionConverters._
      df.put("equality_ids", eqIds.map(Integer.valueOf).asJava)
    }
    val e = new GenericData.Record(manifestEntrySchema)
    e.put("status", 1) // ADDED
    if (seq >= 0L) e.put("sequence_number", seq)
    e.put("data_file", df)
    e
  }

  /** Build a complete table layout under `root`; returns the metadata.json
    * path. `entries` become one manifest; `listContent` sets the
    * manifest-list `content` field (1 = delete manifest); `deleteEntries`
    * (if any) become a second manifest listed with content=1. */
  private def buildTable(root: String, entries: Seq[GenericRecord],
                         snapshotId: Long = 77L, listContent: Int = 0,
                         versionHint: Boolean = false,
                         deleteEntries: Seq[GenericRecord] = Nil): String = {
    val metaDir = s"$root/metadata"
    Files.createDirectories(Paths.get(metaDir))
    val manifestPath = s"$metaDir/m0.avro"
    writeAvro(manifestPath, manifestEntrySchema, entries)
    val listPath = s"$metaDir/snap-$snapshotId.avro"
    val mf = new GenericData.Record(manifestFileSchema)
    mf.put("manifest_path", manifestPath)
    mf.put("content", listContent)
    val mfs = if (deleteEntries.isEmpty) Seq(mf) else {
      val delManifestPath = s"$metaDir/m1.avro"
      writeAvro(delManifestPath, manifestEntrySchema, deleteEntries)
      val dmf = new GenericData.Record(manifestFileSchema)
      dmf.put("manifest_path", delManifestPath)
      dmf.put("content", 1)
      Seq(mf, dmf)
    }
    writeAvro(listPath, manifestFileSchema, mfs)
    val metadata =
      s"""{
         |  "format-version": 2,
         |  "table-uuid": "0f3768f5-0000-4000-8000-000000000000",
         |  "location": "$root",
         |  "current-snapshot-id": $snapshotId,
         |  "current-schema-id": 0,
         |  "schemas": [{
         |    "schema-id": 0, "type": "struct",
         |    "fields": [
         |      {"id": 1, "name": "id", "required": true, "type": "long"},
         |      {"id": 2, "name": "label", "required": false, "type": "string"}
         |    ]
         |  }],
         |  "snapshots": [
         |    {"snapshot-id": $snapshotId, "timestamp-ms": 1700000000000,
         |     "manifest-list": "$listPath"}
         |  ]
         |}""".stripMargin
    val metaPath = s"$metaDir/v1.metadata.json"
    Files.write(Paths.get(metaPath), metadata.getBytes(StandardCharsets.UTF_8))
    if (versionHint)
      Files.write(Paths.get(s"$metaDir/version-hint.text"),
        "1".getBytes(StandardCharsets.UTF_8))
    metaPath
  }

  /** Two parquet data files with ids [0,500) / [500,1000). */
  private def writeDataFiles(root: String): Seq[String] = {
    import org.apache.spark.sql.functions._
    val dir = s"$root/data"
    (0 until 2).map { i =>
      val part = s"$dir/f$i"
      spark.range(i * 500, (i + 1) * 500)
        .select(col("id"), concat(lit("row"), col("id")).as("label"))
        .coalesce(1).write.parquet(part)
      new File(part).listFiles().map(_.getPath)
        .find(p => p.endsWith(".parquet") && !p.contains("_SUCCESS"))
        .getOrElse(fail(s"no parquet file written under $part"))
    }
  }

  // --- tests ---------------------------------------------------------------

  test("iceberg external table scans live data files through the metadata layer") {
    val root = tmpDir("iceberg-tbl")
    val metaPath = buildTable(root, writeDataFiles(root).map(dataFileRecord(_)))
    val c = new GraftContext(spark, tmpDir("graft-iceberg"))
    c.execute(s"CREATE EXTERNAL TABLE ice STORED AS ICEBERG LOCATION '$metaPath'")
    val rows = c.execute(
      "SELECT count(*) AS n, sum(id) AS s FROM staging.ice").collect().head
    assert(rows.getLong(0) === 1000L)
    assert(rows.getLong(1) === (0L until 1000L).sum)
    // projection + filter flow through to the parquet scan
    val one = c.execute("SELECT label FROM staging.ice WHERE id = 999").collect()
    assert(one.map(_.getString(0)).toSeq === Seq("row999"))
  }

  test("table root resolves through metadata/version-hint.text") {
    val root = tmpDir("iceberg-hint")
    buildTable(root, writeDataFiles(root).map(dataFileRecord(_)), versionHint = true)
    val df = graft.sources.IcebergScan.read(spark, root)
    assert(df.count() === 1000L)
  }

  test("DELETED manifest entries are skipped") {
    val root = tmpDir("iceberg-del")
    val Seq(keep, drop) = writeDataFiles(root)
    val entries = Seq(dataFileRecord(keep), dataFileRecord(drop))
    entries(1).put("status", 2) // DELETED
    val metaPath = buildTable(root, entries)
    val df = graft.sources.IcebergScan.read(spark, metaPath)
    assert(df.count() === 500L)
    assert(df.agg(org.apache.spark.sql.functions.max("id")).collect().head.getLong(0) === 499L)
  }

  test("snapshot-less table returns empty frame with the mapped schema") {
    val root = tmpDir("iceberg-empty")
    val metaPath = buildTable(root, Nil, snapshotId = -1L)
    val df = graft.sources.IcebergScan.read(spark, metaPath)
    assert(df.count() === 0L)
    assert(df.schema.map(f => (f.name, f.dataType.typeName, f.nullable)) ===
      Seq(("id", "long", false), ("label", "string", true)))
  }

  /** Write a positional-delete parquet of (file_path, pos) pairs. */
  private def writeDeleteFile(root: String, pairs: Seq[(String, Long)]): String = {
    import spark.implicits._
    val part = s"$root/deletes"
    pairs.toDF("file_path", "pos").coalesce(1).write.parquet(part)
    new File(part).listFiles().map(_.getPath)
      .find(p => p.endsWith(".parquet") && !p.contains("_SUCCESS"))
      .getOrElse(fail(s"no parquet file written under $part"))
  }

  test("v2 positional deletes are applied at scan") {
    val root = tmpDir("iceberg-posdel")
    val Seq(f0, f1) = writeDataFiles(root) // ids [0,500) / [500,1000)
    // kill rows 0..9 of f0 (ids 0..9) and row 499 of f1 (id 999);
    // delete file_path entries carry the raw /abs/path form while the
    // scan reports file:///abs/path — the canonicalization under test
    val del = writeDeleteFile(root, (0L until 10L).map((f0, _)) :+ (f1 -> 499L))
    val meta = buildTable(root, Seq(f0, f1).map(dataFileRecord(_)),
      deleteEntries = Seq(dataFileRecord(del, content = 1)))
    val df = graft.sources.IcebergScan.read(spark, meta)
    assert(df.count() === 989L)
    import org.apache.spark.sql.functions._
    val mm = df.agg(min("id"), max("id")).collect().head
    assert(mm.getLong(0) === 10L)
    assert(mm.getLong(1) === 998L)
    // schema untouched by the internal join columns
    assert(df.columns.toSeq === Seq("id", "label"))
  }

  test("positional deletes respect data sequence numbers (apply only when data seq <= delete seq)") {
    val root = tmpDir("iceberg-posdel-seq")
    val Seq(f0, f1) = writeDataFiles(root) // ids [0,500) / [500,1000)
    // one delete file at seq 2 naming position 0 of BOTH files: applies
    // to f0 (data seq 1 <= 2) but NOT f1 (seq 3 — the file was written
    // after the delete, its row 0 must survive per the spec's rule)
    val del = writeDeleteFile(root, Seq(f0 -> 0L, f1 -> 0L))
    val meta = buildTable(root,
      Seq(dataFileRecord(f0, seq = 1L), dataFileRecord(f1, seq = 3L)),
      deleteEntries = Seq(dataFileRecord(del, content = 1, seq = 2L)))
    val df = graft.sources.IcebergScan.read(spark, meta)
    assert(df.count() === 999L)
    import org.apache.spark.sql.functions._
    assert(df.filter(col("id").isin(0L, 500L))
      .collect().map(_.getLong(0)).toSeq === Seq(500L))
  }

  /** Write an equality-delete parquet of key values for column `name`. */
  private def writeEqDeleteFile(root: String, name: String, keys: Seq[Long]): String = {
    import spark.implicits._
    val part = s"$root/eqdeletes"
    keys.toDF(name).coalesce(1).write.parquet(part)
    new File(part).listFiles().map(_.getPath)
      .find(p => p.endsWith(".parquet") && !p.contains("_SUCCESS"))
      .getOrElse(fail(s"no parquet file written under $part"))
  }

  test("v2 equality deletes apply with sequence-number semantics") {
    val root = tmpDir("iceberg-eqdel2")
    val Seq(f0, f1) = writeDataFiles(root) // ids [0,500) / [500,1000)
    // delete keys id ∈ {10, 600} at sequence 2: kills id 10 (f0 has data
    // seq 1 < 2) but NOT id 600 (f1's seq 3 > 2 — the row was written
    // AFTER the delete and must survive, the spec's strictly-lower rule)
    val del = writeEqDeleteFile(root, "id", Seq(10L, 600L))
    val meta = buildTable(root,
      Seq(dataFileRecord(f0, seq = 1L), dataFileRecord(f1, seq = 3L)),
      deleteEntries = Seq(dataFileRecord(del, content = 2, seq = 2L, eqIds = Seq(1))))
    val df = graft.sources.IcebergScan.read(spark, meta)
    assert(df.count() === 999L)
    import org.apache.spark.sql.functions._
    val hit = df.filter(col("id").isin(10L, 600L))
      .collect().map(_.getLong(0)).toSeq
    assert(hit === Seq(600L))
    assert(df.columns.toSeq === Seq("id", "label")) // no internal columns leak
  }

  test("positional and equality deletes compose on one snapshot") {
    val root = tmpDir("iceberg-mixdel")
    val Seq(f0, f1) = writeDataFiles(root)
    val pos = writeDeleteFile(root, Seq(f0 -> 0L)) // kills id 0 by position
    val eq = writeEqDeleteFile(root, "id", Seq(999L)) // kills id 999 by key
    val meta = buildTable(root,
      Seq(dataFileRecord(f0, seq = 1L), dataFileRecord(f1, seq = 1L)),
      deleteEntries = Seq(
        dataFileRecord(pos, content = 1, seq = 2L),
        dataFileRecord(eq, content = 2, seq = 2L, eqIds = Seq(1))))
    val df = graft.sources.IcebergScan.read(spark, meta)
    assert(df.count() === 998L)
    import org.apache.spark.sql.functions._
    val mm = df.agg(min("id"), max("id")).collect().head
    assert(mm.getLong(0) === 1L && mm.getLong(1) === 998L)
  }

  test("equality delete files without equality_ids fail loudly") {
    val root = tmpDir("iceberg-eqdel")
    val files = writeDataFiles(root)
    val meta = buildTable(root, files.map(dataFileRecord(_)),
      deleteEntries = Seq(dataFileRecord(files.head, content = 2)))
    val ex = intercept[IllegalArgumentException](
      graft.sources.IcebergScan.read(spark, meta))
    assert(ex.getMessage.contains("equality_ids"))
  }

  test("non-parquet data files fail loudly") {
    val root = tmpDir("iceberg-orc")
    val files = writeDataFiles(root)
    val meta = buildTable(root, Seq(dataFileRecord(files.head, format = "ORC")))
    val ex = intercept[IllegalArgumentException](
      graft.sources.IcebergScan.read(spark, meta))
    assert(ex.getMessage.contains("parquet only"))
  }

  test("snapshot time travel: as-of pins to the latest snapshot at or before the timestamp") {
    val root = tmpDir("iceberg-tt")
    val Seq(f0, f1) = writeDataFiles(root) // ids [0,500) / [500,1000)
    val metaDir = s"$root/metadata"
    Files.createDirectories(Paths.get(metaDir))
    // snapshot 10 (t=1000...0): only f0; snapshot 20 (t=+60s): f0+f1
    def manifestList(name: String, entries: Seq[GenericRecord]): String = {
      val mPath = s"$metaDir/m_$name.avro"
      writeAvro(mPath, manifestEntrySchema, entries)
      val lPath = s"$metaDir/snap_$name.avro"
      val mf = new GenericData.Record(manifestFileSchema)
      mf.put("manifest_path", mPath)
      mf.put("content", 0)
      writeAvro(lPath, manifestFileSchema, Seq(mf))
      lPath
    }
    val l1 = manifestList("s10", Seq(dataFileRecord(f0)))
    val l2 = manifestList("s20", Seq(dataFileRecord(f0), dataFileRecord(f1)))
    val t1 = 1700000000000L
    val t2 = t1 + 60000L
    val metaPath = s"$metaDir/v1.metadata.json"
    Files.write(Paths.get(metaPath),
      s"""{
         |  "format-version": 2, "table-uuid": "0f3768f5-0000-4000-8000-000000000001",
         |  "location": "$root", "current-snapshot-id": 20, "current-schema-id": 0,
         |  "schemas": [{"schema-id": 0, "type": "struct", "fields": [
         |    {"id": 1, "name": "id", "required": true, "type": "long"},
         |    {"id": 2, "name": "label", "required": false, "type": "string"}]}],
         |  "snapshots": [
         |    {"snapshot-id": 10, "timestamp-ms": $t1, "manifest-list": "$l1"},
         |    {"snapshot-id": 20, "timestamp-ms": $t2, "manifest-list": "$l2"}
         |  ]
         |}""".stripMargin.getBytes(StandardCharsets.UTF_8))
    // default read = current snapshot (both files)
    assert(graft.sources.IcebergScan.read(spark, metaPath).count() === 1000L)
    // pinned between the snapshots = snapshot 10 only
    assert(graft.sources.IcebergScan.read(spark, metaPath, Some(t1 + 1000)).count() === 500L)
    // exactly at a snapshot's timestamp includes it
    assert(graft.sources.IcebergScan.read(spark, metaPath, Some(t2)).count() === 1000L)
    // before the first snapshot fails loudly
    val ex = intercept[IllegalArgumentException](
      graft.sources.IcebergScan.read(spark, metaPath, Some(t1 - 1)))
    assert(ex.getMessage.contains("no iceberg snapshot"))
    // the SQL surface: OPTIONS ('as_of' '<ISO>') on the external table
    val c = new GraftContext(spark, tmpDir("graft-iceberg-tt"))
    val iso = java.time.Instant.ofEpochMilli(t1 + 1000).toString
    c.execute(s"CREATE EXTERNAL TABLE ice_tt STORED AS ICEBERG LOCATION '$metaPath' " +
      s"OPTIONS ('as_of' '$iso')")
    val n = c.execute("SELECT count(*) AS n FROM staging.ice_tt").collect().head.getLong(0)
    assert(n === 500L)
  }

  test("as-of resolves through snapshot-log ancestry, never a rolled-back orphan") {
    val root = tmpDir("iceberg-tt-log")
    val Seq(f0, f1) = writeDataFiles(root) // ids [0,500) / [500,1000)
    val metaDir = s"$root/metadata"
    Files.createDirectories(Paths.get(metaDir))
    def manifestList(name: String, entries: Seq[GenericRecord]): String = {
      val mPath = s"$metaDir/m_$name.avro"
      writeAvro(mPath, manifestEntrySchema, entries)
      val lPath = s"$metaDir/snap_$name.avro"
      val mf = new GenericData.Record(manifestFileSchema)
      mf.put("manifest_path", mPath)
      mf.put("content", 0)
      writeAvro(lPath, manifestFileSchema, Seq(mf))
      lPath
    }
    val l1 = manifestList("s10", Seq(dataFileRecord(f0)))
    val l2 = manifestList("s20", Seq(dataFileRecord(f0), dataFileRecord(f1)))
    val t1 = 1700000000000L
    val t2 = t1 + 60000L
    // Snapshot 20 (t2) was created then ROLLED BACK: the snapshot-log —
    // the current state's ancestry — carries only snapshot 10, while the
    // raw snapshots array still lists the not-yet-expired orphan 20.
    // Per the Iceberg spec, timestamp travel resolves via the log, so
    // as_of at t2+… must pin snapshot 10, not the orphan.
    val metaPath = s"$metaDir/v1.metadata.json"
    Files.write(Paths.get(metaPath),
      s"""{
         |  "format-version": 2, "table-uuid": "0f3768f5-0000-4000-8000-000000000002",
         |  "location": "$root", "current-snapshot-id": 10, "current-schema-id": 0,
         |  "schemas": [{"schema-id": 0, "type": "struct", "fields": [
         |    {"id": 1, "name": "id", "required": true, "type": "long"},
         |    {"id": 2, "name": "label", "required": false, "type": "string"}]}],
         |  "snapshots": [
         |    {"snapshot-id": 10, "timestamp-ms": $t1, "manifest-list": "$l1"},
         |    {"snapshot-id": 20, "timestamp-ms": $t2, "manifest-list": "$l2"}
         |  ],
         |  "snapshot-log": [
         |    {"timestamp-ms": $t1, "snapshot-id": 10}
         |  ]
         |}""".stripMargin.getBytes(StandardCharsets.UTF_8))
    assert(graft.sources.IcebergScan.read(spark, metaPath, Some(t2 + 1000)).count() === 500L)
    assert(graft.sources.IcebergScan.read(spark, metaPath, Some(t1)).count() === 500L)
    // before the first LOG entry fails loudly even though no array probe ran
    val ex = intercept[IllegalArgumentException](
      graft.sources.IcebergScan.read(spark, metaPath, Some(t1 - 1)))
    assert(ex.getMessage.contains("no iceberg snapshot"))
  }
}
