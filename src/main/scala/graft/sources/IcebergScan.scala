package graft.sources

import org.apache.avro.file.{DataFileReader, SeekableByteArrayInput}
import org.apache.avro.generic.{GenericDatumReader, GenericRecord}
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types._

import graft.lake.{LakeIO, Manifest}

/** Read-only Iceberg table scan from a `metadata.json` file — the
  * capability the reference gets from `StaticTable::from_metadata_file`
  * (reference `src/catalog/metastore.rs:237-246`, table machinery
  * `src/context/iceberg.rs`). No iceberg jar exists offline, but the
  * format's metadata layer is JSON + Avro, and Avro IS on the Spark
  * classpath — so this walks the spec directly:
  *
  *   metadata.json → current snapshot → manifest-list (Avro)
  *     → manifests (Avro) → live parquet data files → one parquet scan
  *
  * Scope (documented read-only subset): format versions 1 and 2; DELETED
  * manifest entries are skipped; v2 POSITIONAL delete files are applied
  * at scan time (anti-join on the file/row-position pair) and v2
  * EQUALITY delete files with full sequence-number semantics (a delete
  * kills matching rows only in data files with a STRICTLY LOWER data
  * sequence number — spec §Scan Planning; `equality_ids` resolve to
  * columns through the schema's field ids, null-safe equality as the
  * spec requires); equality deletes WITHOUT equality_ids and non-parquet
  * data files fail loudly. A snapshot-less (empty) table returns an
  * empty DataFrame with the schema mapped from the table metadata.
  */
object IcebergScan {

  import Manifest.Json
  import Manifest.Json._

  def read(spark: SparkSession, location: String): DataFrame =
    read(spark, location, None)

  /** Snapshot time travel: `asOfMs` pins the read to the latest snapshot
    * whose `timestamp-ms` is at or before the given epoch millis — the
    * static-snapshot read the reference performs when a table is
    * registered at a point in time (`src/context/iceberg.rs`); the
    * metadata walk already parses the full snapshot list, so pinning is
    * a selection, not a new format path. No snapshot at or before the
    * timestamp fails loudly (same contract as the lake's `t('<ts>')`). */
  def read(spark: SparkSession, location: String, asOfMs: Option[Long]): DataFrame = {
    val metaPath = resolveMetadata(location)
    val meta = Json.parse(LakeIO.readString(metaPath)).asInstanceOf[O].m

    selectSnapshot(meta, asOfMs) match {
      case None =>
        spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
          schemaOf(meta))
      case Some(snap) =>
        val listPath = snap.get("manifest-list") match {
          case Some(S(p)) => p
          case _ => throw new IllegalArgumentException(
            "iceberg snapshot has no manifest-list (v1 'manifests' inline lists are not supported)")
        }
        val wf = walkFiles(reroute(listPath))
        if (wf.data.isEmpty)
          spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
            schemaOf(meta))
        else {
          var data = spark.read.parquet(wf.data.map(_._1): _*)
          // _metadata resolves only on the raw scan relation — derive the
          // per-row data sequence number BEFORE any delete anti-join
          if (wf.eqDeletes.nonEmpty || wf.posDeletes.nonEmpty)
            data = withSeqColumn(data, wf.data)
          if (wf.posDeletes.nonEmpty)
            data = applyPositionalDeletes(spark, data, wf.posDeletes)
          if (wf.eqDeletes.nonEmpty)
            data = applyEqualityDeletes(spark, data, wf.eqDeletes,
              fieldIdToName(meta))
          if (wf.eqDeletes.nonEmpty || wf.posDeletes.nonEmpty) data = data.drop("__seq")
          data
        }
    }
  }

  /** v2 positional deletes (spec §Delete Formats): each delete parquet
    * holds (file_path, pos) pairs naming dead rows by data file + 0-based
    * row position. Applied distributed: the scan exposes the engine's
    * `_metadata.file_path` / `_metadata.row_index` columns (computed
    * in-row, no extra pass) and the delete set anti-joins on the pair —
    * Catalyst broadcasts the (typically tiny) delete side below the
    * autoBroadcast threshold and falls back to a keyed shuffle when a
    * table carries billions of dead positions, so the plan survives both
    * extremes. Paths are scheme-canonicalized on both sides because
    * manifests may store `/abs/path` while the scan reports
    * `file:///abs/path`. */
  private def applyPositionalDeletes(spark: SparkSession, data: DataFrame,
                                     deleteFiles: Seq[(String, Long)]): DataFrame = {
    import org.apache.spark.sql.functions._
    def canon(c: org.apache.spark.sql.Column) =
      regexp_replace(c, "^[a-zA-Z][a-zA-Z0-9+.\\-]*:/*", "/")
    // spec rule: a position delete applies only to data files whose data
    // sequence number is <= the delete file's — carried as a residual on
    // the hash-joinable (file, pos) equi keys, mirroring the equality-
    // delete handling (delete files grouped by seq to batch the reads)
    val dels = deleteFiles.groupBy(_._2).map { case (seq, files) =>
      spark.read.parquet(files.map(_._1): _*)
        .select(canon(col("file_path")).as("__fp"), col("pos").cast("long").as("__pos"))
        .withColumn("__dseq", lit(seq))
    }.reduce(_ unionByName _)
    val withKeys = data
      .withColumn("__fp", canon(col("_metadata.file_path")))
      .withColumn("__pos", col("_metadata.row_index"))
    val cond = withKeys("__fp") === dels("__fp") &&
      withKeys("__pos") === dels("__pos") && dels("__dseq") >= withKeys("__seq")
    withKeys.join(dels, cond, "left_anti").drop("__fp", "__pos")
  }

  /** Accept a direct metadata file, or a table root (resolved through
    * `metadata/version-hint.text` or the highest `v*.metadata.json`). */
  private def resolveMetadata(location: String): Path = {
    val p = new Path(location)
    if (location.endsWith(".json")) p
    else {
      val metaDir = new Path(p, "metadata")
      val hint = new Path(metaDir, "version-hint.text")
      if (LakeIO.exists(hint)) {
        val v = LakeIO.readString(hint).trim
        new Path(metaDir, s"v$v.metadata.json")
      } else {
        val candidates = LakeIO.listStatus(metaDir).map(_.getPath.getName)
          .filter(n => n.endsWith(".metadata.json"))
        if (candidates.isEmpty) throw new IllegalArgumentException(
          s"no iceberg metadata found under $metaDir")
        new Path(metaDir, candidates.max) // vN sorts lexicographically for fixed width; best effort
      }
    }
  }

  private def selectSnapshot(meta: Map[String, V],
                             asOfMs: Option[Long]): Option[Map[String, V]] = asOfMs match {
    case None => currentSnapshot(meta)
    case Some(ts) =>
      def tsOf(s: Map[String, V]): Long = s.get("timestamp-ms") match {
        case Some(N(n)) => n.toLong
        case _ => Long.MaxValue // a snapshot without a timestamp never matches
      }
      // Per the Iceberg spec, timestamp travel resolves through the
      // snapshot LOG (the current table state's ancestry): after a
      // rollback the log drops the abandoned branch, while the raw
      // `snapshots` array may still carry those orphans until they
      // expire — picking max(timestamp) over the array could pin a
      // snapshot that was never an ancestor. Fall back to the array
      // only for metadata written without a log.
      val logIds: Map[Long, Long] = meta.get("snapshot-log") match {
        case Some(A(xs)) => xs.collect {
          case O(e) => (e.get("timestamp-ms"), e.get("snapshot-id")) match {
            case (Some(N(t)), Some(N(id))) => Some(t.toLong -> id.toLong)
            case _ => None
          }
        }.flatten.toMap
        case _ => Map.empty
      }
      def byId(id: Long): Option[Map[String, V]] = meta.get("snapshots") match {
        case Some(A(xs)) => xs.collectFirst {
          case O(s) if s.get("snapshot-id").exists {
            case N(n) => n.toLong == id; case _ => false } => s
        }
        case _ => None
      }
      val picked =
        if (logIds.nonEmpty) {
          val eligible = logIds.filter { case (t, _) => t <= ts }
          eligible.toSeq.sortBy(_._1).lastOption.flatMap { case (_, id) => byId(id) }
        } else meta.get("snapshots") match {
          case Some(A(xs)) =>
            val cs = xs.collect { case O(s) if tsOf(s) <= ts => s }
            if (cs.isEmpty) None else Some(cs.maxBy(tsOf))
          case _ => None
        }
      if (picked.isEmpty) throw new IllegalArgumentException(
        s"no iceberg snapshot at or before ${java.time.Instant.ofEpochMilli(ts)}")
      picked
  }

  private def currentSnapshot(meta: Map[String, V]): Option[Map[String, V]] = {
    val currentId = meta.get("current-snapshot-id") match {
      case Some(N(n)) if n.toLong != -1L => Some(n.toLong)
      case _ => None
    }
    currentId.flatMap { id =>
      meta.get("snapshots") match {
        case Some(A(xs)) => xs.collectFirst {
          case O(s) if s.get("snapshot-id").exists {
            case N(n) => n.toLong == id; case _ => false } => s
        }
        case _ => None
      }
    }
  }

  /** The snapshot's live file inventory: data files with their data
    * sequence numbers, positional-delete files, and equality-delete
    * files with (sequence number, equality field ids). */
  private case class WalkedFiles(data: Seq[(String, Long)],
                                 posDeletes: Seq[(String, Long)],
                                 eqDeletes: Seq[(String, Long, Seq[Int])])

  /** Walk manifest-list → manifests. Sequence numbers follow the v2
    * inheritance rule: an entry without its own
    * sequence_number/data_sequence_number takes the manifest's (from the
    * manifest-list entry); v1 tables have neither and default to 0. */
  private def walkFiles(manifestListPath: String): WalkedFiles = {
    val entries = readAvro(new Path(manifestListPath))
    val manifests = entries.map { r =>
      // v2 manifest-list carries `content`: 0 = data, 1 = deletes
      (String.valueOf(r.get("manifest_path")),
        longField(r, "content").getOrElse(0L),
        longField(r, "sequence_number").getOrElse(0L))
    }
    val data = Seq.newBuilder[(String, Long)]
    val posDeletes = Seq.newBuilder[(String, Long)]
    val eqDeletes = Seq.newBuilder[(String, Long, Seq[Int])]
    manifests.foreach { case (mp, mContent, mSeq) =>
      readAvro(new Path(reroute(mp))).foreach { entry =>
        // status: 0 EXISTING, 1 ADDED, 2 DELETED
        val status = longField(entry, "status").getOrElse(0L)
        if (status != 2L) {
          val df = entry.get("data_file").asInstanceOf[GenericRecord]
          // v2 data_file content: 0 data, 1 position deletes, 2 equality
          // deletes; files inside a delete manifest default to positional
          val content = longField(df, "content")
            .getOrElse(if (mContent == 1L) 1L else 0L)
          val fmt = String.valueOf(df.get("file_format"))
          if (!fmt.equalsIgnoreCase("PARQUET")) throw new IllegalArgumentException(
            s"unsupported iceberg data file format $fmt (parquet only)")
          val path = reroute(String.valueOf(df.get("file_path")))
          val seq = longField(entry, "sequence_number")
            .orElse(longField(entry, "data_sequence_number"))
            .getOrElse(mSeq)
          content match {
            case 0L => data += ((path, seq))
            case 1L => posDeletes += ((path, seq))
            case _ =>
              val ids = intListField(df, "equality_ids").getOrElse(Seq.empty)
              if (ids.isEmpty) throw new IllegalArgumentException(
                "iceberg equality delete file carries no equality_ids — cannot apply safely")
              eqDeletes += ((path, seq, ids))
          }
        }
      }
    }
    WalkedFiles(data.result(), posDeletes.result(), eqDeletes.result())
  }

  /** v2 equality deletes (spec §Scan Planning): each delete parquet holds
    * key tuples over the columns named by `equality_ids`; a data row dies
    * iff SOME equality delete with a STRICTLY GREATER sequence number
    * matches it null-safely on those columns. Applied distributed: rows
    * get their file's data sequence number through a plan-baked
    * path→seq map over `_metadata.file_path` (in-row, no extra pass),
    * then one anti-join per distinct equality-id set — null-safe equi
    * keys (hash-joinable) plus the sequence inequality as the join
    * residual, delete side broadcast when small. */
  /** Per-row data sequence number via a plan-baked path→seq map over
    * `_metadata.file_path` (in-row, no extra pass; the map is bounded by
    * the snapshot's file count — a table with millions of files wants a
    * broadcast-join variant instead). A lookup MISS (canonicalization
    * drift between manifest paths and scan paths) raises in-row rather
    * than yielding NULL — a NULL __seq would make every delete residual
    * NULL and silently resurrect deleted rows. */
  private def withSeqColumn(data: DataFrame,
                            dataFiles: Seq[(String, Long)]): DataFrame = {
    import org.apache.spark.sql.functions._
    def canonStr(p: String) = p.replaceFirst("^[a-zA-Z][a-zA-Z0-9+.\\-]*:/*", "/")
    val seqMap = typedLit(dataFiles.map { case (p, s) => canonStr(p) -> s }.toMap)
    val lookup = element_at(seqMap,
      regexp_replace(col("_metadata.file_path"), "^[a-zA-Z][a-zA-Z0-9+.\\-]*:/*", "/"))
    data.withColumn("__seq", when(lookup.isNotNull, lookup).otherwise(raise_error(
      concat(lit("iceberg: data file path missing from sequence map (path canonicalization drift): "),
        col("_metadata.file_path")))))
  }

  private def applyEqualityDeletes(spark: SparkSession, data0: DataFrame,
                                   eqDeletes: Seq[(String, Long, Seq[Int])],
                                   idToName: Map[Int, String]): DataFrame = {
    import org.apache.spark.sql.functions._
    var data = data0
    eqDeletes.groupBy(_._3).foreach { case (ids, files) =>
      val names = ids.map(i => idToName.getOrElse(i,
        throw new IllegalArgumentException(
          s"equality_ids field id $i not found in the table schema")))
      val dels = files.map { case (p, s, _) =>
        spark.read.parquet(p).select(names.map(col): _*).withColumn("__dseq", lit(s))
      }.reduce(_ unionByName _)
      val cond = names.map(n => data(n) <=> dels(n)).reduce(_ && _) &&
        (dels("__dseq") > data("__seq"))
      data = data.join(dels, cond, "left_anti")
    }
    data
  }

  /** Iceberg metadata stores absolute file URLs; http(s) ones must flow
    * through the Range-request filesystem like the root metadata did. */
  private def reroute(p: String): String = HttpRangeFileSystem.rewriteScheme(p)

  private def longField(r: GenericRecord, name: String): Option[Long] =
    if (r.getSchema.getField(name) == null) None
    else r.get(name) match {
      case null => None
      case n: java.lang.Number => Some(n.longValue())
      case _ => None
    }

  private def intListField(r: GenericRecord, name: String): Option[Seq[Int]] =
    if (r.getSchema.getField(name) == null) None
    else r.get(name) match {
      case null => None
      case l: java.util.Collection[_] =>
        import scala.jdk.CollectionConverters._
        Some(l.asScala.toSeq.map(_.asInstanceOf[java.lang.Number].intValue))
      case _ => None
    }

  /** Manifest files are small metadata objects — read fully, then iterate
    * with the file's embedded writer schema (forward-compatible with the
    * spec's optional fields). */
  private def readAvro(p: Path): Seq[GenericRecord] = {
    val bytes = LakeIO.readBytes(p)
    val reader = new DataFileReader[GenericRecord](
      new SeekableByteArrayInput(bytes), new GenericDatumReader[GenericRecord]())
    try {
      val out = Seq.newBuilder[GenericRecord]
      while (reader.hasNext) out += reader.next()
      out.result()
    } finally reader.close()
  }

  // --- iceberg JSON schema → Spark schema (for snapshot-less tables) -------

  /** The current schema's field objects (v2 `schemas` by
    * current-schema-id, v1 inline `schema`). */
  private def currentSchemaFields(meta: Map[String, V]): Seq[Map[String, V]] = {
    val schemaObj = meta.get("schemas") match {
      case Some(A(xs)) =>
        val currentId = meta.get("current-schema-id") match {
          case Some(N(n)) => n.toInt
          case _ => 0
        }
        xs.collectFirst {
          case O(s) if s.get("schema-id").exists {
            case N(n) => n.toInt == currentId; case _ => false } => s
        }.orElse(xs.headOption.map(_.asInstanceOf[O].m))
      case _ => meta.get("schema").map(_.asInstanceOf[O].m) // v1
    }
    schemaObj.flatMap(_.get("fields")) match {
      case Some(A(fs)) => fs.map(_.asInstanceOf[O].m)
      case _ => Nil
    }
  }

  private def schemaOf(meta: Map[String, V]): StructType =
    StructType(currentSchemaFields(meta).map { f =>
      val name = f("name").asInstanceOf[S].s
      val required = f.get("required").contains(B(true))
      StructField(name, icebergType(f("type")), nullable = !required)
    })

  /** Iceberg field id → column name (how equality_ids resolve). */
  private def fieldIdToName(meta: Map[String, V]): Map[Int, String] =
    currentSchemaFields(meta).flatMap { f =>
      f.get("id") match {
        case Some(N(n)) => Some(n.toInt -> f("name").asInstanceOf[S].s)
        case _ => None
      }
    }.toMap

  private val DecimalRe = """decimal\((\d+),\s*(\d+)\)""".r
  private def icebergType(t: V): DataType = t match {
    case S("boolean") => BooleanType
    case S("int") => IntegerType
    case S("long") => LongType
    case S("float") => FloatType
    case S("double") => DoubleType
    case S("string") | S("uuid") => StringType
    case S("date") => DateType
    case S("timestamp") | S("timestamptz") => TimestampType
    case S("binary") | S("fixed") => BinaryType
    case S(DecimalRe(p, sc)) => DecimalType(p.toInt, sc.toInt)
    case S(other) => throw new IllegalArgumentException(s"unsupported iceberg type $other")
    case _ => throw new IllegalArgumentException("nested iceberg types are not supported")
  }
}
