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
  * at scan time (anti-join on the file/row-position pair — see `read`);
  * tables with EQUALITY delete files fail loudly rather than returning
  * resurrected rows; non-parquet data files fail loudly. A snapshot-less
  * (empty) table returns an empty DataFrame with the schema mapped from
  * the table metadata.
  */
object IcebergScan {

  import Manifest.Json
  import Manifest.Json._

  def read(spark: SparkSession, location: String): DataFrame = {
    val metaPath = resolveMetadata(location)
    val meta = Json.parse(LakeIO.readString(metaPath)).asInstanceOf[O].m

    currentSnapshot(meta) match {
      case None =>
        spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
          schemaOf(meta))
      case Some(snap) =>
        val listPath = snap.get("manifest-list") match {
          case Some(S(p)) => p
          case _ => throw new IllegalArgumentException(
            "iceberg snapshot has no manifest-list (v1 'manifests' inline lists are not supported)")
        }
        val (files, posDeletes) = walkFiles(reroute(listPath))
        if (files.isEmpty)
          spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
            schemaOf(meta))
        else {
          val data = spark.read.parquet(files: _*)
          if (posDeletes.isEmpty) data
          else applyPositionalDeletes(spark, data, posDeletes)
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
                                     deleteFiles: Seq[String]): DataFrame = {
    import org.apache.spark.sql.functions._
    def canon(c: org.apache.spark.sql.Column) =
      regexp_replace(c, "^[a-zA-Z][a-zA-Z0-9+.\\-]*:/*", "/")
    val dels = spark.read.parquet(deleteFiles: _*)
      .select(canon(col("file_path")).as("__fp"), col("pos").cast("long").as("__pos"))
    data
      .withColumn("__fp", canon(col("_metadata.file_path")))
      .withColumn("__pos", col("_metadata.row_index"))
      .join(dels, Seq("__fp", "__pos"), "left_anti")
      .drop("__fp", "__pos")
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

  /** Walk manifest-list → manifests, returning (live data-file paths,
    * live positional-delete-file paths). Equality deletes fail loudly —
    * applying them needs the equality-field-id column resolution this
    * read-only scan doesn't carry. */
  private def walkFiles(manifestListPath: String): (Seq[String], Seq[String]) = {
    val entries = readAvro(new Path(manifestListPath))
    val manifests = entries.map { r =>
      // v2 manifest-list carries `content`: 0 = data, 1 = deletes
      (String.valueOf(r.get("manifest_path")), longField(r, "content").getOrElse(0L))
    }
    val data = Seq.newBuilder[String]
    val posDeletes = Seq.newBuilder[String]
    manifests.foreach { case (mp, mContent) =>
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
          content match {
            case 0L => data += path
            case 1L => posDeletes += path
            case _ => throw new IllegalArgumentException(
              "iceberg equality delete files are not supported (positional deletes are)")
          }
        }
      }
    }
    (data.result(), posDeletes.result())
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

  private def schemaOf(meta: Map[String, V]): StructType = {
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
    schemaObj match {
      case Some(s) => s.get("fields") match {
        case Some(A(fs)) => StructType(fs.map { fv =>
          val f = fv.asInstanceOf[O].m
          val name = f("name").asInstanceOf[S].s
          val required = f.get("required").contains(B(true))
          StructField(name, icebergType(f("type")), nullable = !required)
        })
        case _ => StructType(Nil)
      }
      case None => StructType(Nil)
    }
  }

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
