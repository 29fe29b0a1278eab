package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, lit}
import org.apache.spark.sql.types._

import graft.lake.{LakeIO, Manifest}

/** Read-only scan of an EXTERNAL Delta Lake table — the format the
  * reference's own storage layer writes through delta-rs (provider built
  * at `src/catalog/metastore.rs:176-207`). Graft tables use the graft
  * manifest layout; this reader exists for interop, so data produced BY
  * the reference (or any delta writer) can be queried in place:
  *
  *   _delta_log/_last_checkpoint → checkpoint parquet (if any)
  *     → subsequent NNNNNNNNNNNNNNNNNNNN.json commits (JSON-lines of
  *       add/remove/metaData/protocol actions, later actions win)
  *     → live file set → parquet scan (+ partition columns re-attached
  *       from each file's partitionValues)
  *
  * Scope (documented read-only subset): reader protocol version 1 only —
  * tables using deletion vectors or column mapping (minReaderVersion > 1,
  * or a dv on any live file) fail loudly rather than resurrecting rows;
  * `metaData.schemaString` is the Spark-schema JSON Delta inherited from
  * Spark, so types round-trip exactly. Partition columns are not stored
  * in the data files; files are grouped by their partitionValues and each
  * group's scan gets the values re-attached as typed literal columns
  * (layout-independent — works for non-hive-style file arrangements).
  */
object DeltaScan {

  import Manifest.Json
  import Manifest.Json._

  private case class AddFile(path: String, partitionValues: Map[String, String])

  def read(spark: SparkSession, location: String): DataFrame = {
    val root = new Path(location)
    val logDir = new Path(root, "_delta_log")
    val isHttpish = logDir.toUri.getScheme match {
      case "ghttp" | "ghttps" => true
      case _ => false
    }
    // a directory is not an object on HTTP stores — only probe it on
    // filesystems that can answer
    if (!isHttpish && !LakeIO.exists(logDir))
      throw new IllegalArgumentException(s"no _delta_log under $location")

    // checkpoint base (if the log has been compacted), then JSON commits
    val cp = readCheckpoint(spark, logDir)
    val cpVersion = cp.version
    val live = new scala.collection.mutable.LinkedHashMap[String, AddFile]
    cp.adds.foreach(a => live(a.path) = a)
    // metaData usually lives ONLY in the checkpoint once the log is
    // compacted (writers re-emit it on schema change, not per commit)
    var schema: Option[StructType] = cp.schemaString.map(parseSchema)
    var partCols: Seq[String] = cp.partitionColumns

    val commits: Seq[String] =
      if (isHttpish) {
        // HTTP object stores cannot LIST; Delta versions are contiguous,
        // so probe sequentially from the checkpoint (or 0) until the
        // first gap — the standard listing alternative on such stores
        val start = cpVersion.map(_ + 1).getOrElse(0L)
        Iterator.iterate(start)(_ + 1)
          .takeWhile(v => LakeIO.exists(new Path(logDir, f"$v%020d.json")))
          .map(v => f"$v%020d.json").toSeq
      } else
        LakeIO.listStatus(logDir).map(_.getPath.getName)
          .filter(_.matches("\\d{20}\\.json"))
          .filter(n => cpVersion.forall(v => n.stripSuffix(".json").toLong > v))
          .sorted.toSeq
    if (cpVersion.isEmpty && commits.isEmpty)
      throw new IllegalArgumentException(s"empty delta log under $location")

    for (name <- commits;
         line <- LakeIO.readString(new Path(logDir, name)).linesIterator
           if line.trim.nonEmpty) {
      val action = Json.parse(line).asInstanceOf[O].m
      action.get("protocol").foreach { case O(p) =>
        val v = p.get("minReaderVersion") match { case Some(N(n)) => n.toInt; case _ => 1 }
        if (v > 1) throw new IllegalArgumentException(
          s"delta reader protocol $v not supported (deletion vectors / column mapping)")
      case _ => () }
      action.get("metaData").foreach { case O(m) =>
        m.get("format").foreach { case O(f) =>
          if (!f.get("provider").contains(S("parquet")))
            throw new IllegalArgumentException("only parquet-format delta tables are supported")
        case _ => () }
        schema = m.get("schemaString").map {
          case S(s) => parseSchema(s)
          case _ => throw new IllegalArgumentException("bad delta schemaString")
        }
        partCols = m.get("partitionColumns") match {
          case Some(A(xs)) => xs.map(_.asInstanceOf[S].s)
          case _ => Seq.empty
        }
      case _ => () }
      action.get("add").foreach { case O(a) =>
        if (a.get("deletionVector").exists(_ != Null))
          throw new IllegalArgumentException("delta deletion vectors are not supported")
        val p = a("path").asInstanceOf[S].s
        val pv = a.get("partitionValues") match {
          case Some(O(m)) => m.collect { case (k, S(v)) => k -> v }
          case _ => Map.empty[String, String]
        }
        live(p) = AddFile(p, pv)
      case _ => () }
      action.get("remove").foreach { case O(r) =>
        live.remove(r("path").asInstanceOf[S].s)
      case _ => () }
    }

    val metaSchema = schema.getOrElse(throw new IllegalArgumentException(
      s"delta log under $location carries no metaData action"))
    val dataSchema = StructType(metaSchema.filterNot(f => partCols.contains(f.name)))
    if (live.isEmpty)
      return spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], metaSchema)

    // the spec defines add.path as a URL-encoded relative (or absolute)
    // URI — decode before resolving (spaces/specials in partition dirs)
    def resolve(p0: String): String = {
      val p = java.net.URLDecoder.decode(p0, "UTF-8")
      if (p.contains("://") || p.startsWith("/")) HttpRangeFileSystem.rewriteScheme(p)
      else new Path(root, p).toString
    }

    if (partCols.isEmpty)
      spark.read.schema(dataSchema).parquet(live.values.map(f => resolve(f.path)).toSeq: _*)
    else {
      // one scan per distinct partition tuple, values re-attached as
      // typed literals (NULL for Delta's __HIVE_DEFAULT_PARTITION__)
      val byPart = live.values.toSeq.groupBy(_.partitionValues)
      byPart.map { case (pv, files) =>
        val base = spark.read.schema(dataSchema)
          .parquet(files.map(f => resolve(f.path)): _*)
        partCols.foldLeft(base) { (df, c) =>
          val f = metaSchema(c)
          val raw = pv.get(c).filterNot(_ == "__HIVE_DEFAULT_PARTITION__")
          df.withColumn(c, raw match {
            case Some(v) => lit(v).cast(f.dataType)
            case None => lit(null).cast(f.dataType)
          })
        }.select(metaSchema.fieldNames.map(col).toSeq: _*)
      }.reduce(_ union _)
    }
  }

  /** Export a DataFrame as a NEW Delta Lake table (one version-0 commit:
    * protocol v1 + metaData + adds) — the write half of the interop
    * story: a table the reference's delta-rs (or delta-spark / any Delta
    * reader) opens directly. Unpartitioned, overwrite semantics; the
    * schemaString is Spark's own schema JSON, which Delta inherited, so
    * types round-trip exactly. */
  def write(df: DataFrame, location: String): Unit = {
    df.write.mode("overwrite").parquet(location)
    val root = new Path(location)
    val files = LakeIO.listStatus(root)
      .filter(s => s.isFile && s.getPath.getName.endsWith(".parquet"))
      .sortBy(_.getPath.getName)
    val now = System.currentTimeMillis()
    val schemaJson = Manifest.jstr(df.schema.json)
    val actions = Seq(
      """{"protocol":{"minReaderVersion":1,"minWriterVersion":2}}""",
      s"""{"metaData":{"id":${Manifest.jstr(java.util.UUID.randomUUID().toString)},""" +
        s""""format":{"provider":"parquet","options":{}},"schemaString":$schemaJson,""" +
        s""""partitionColumns":[],"configuration":{},"createdTime":$now}}""") ++
      files.map { s =>
        s"""{"add":{"path":${Manifest.jstr(s.getPath.getName)},"partitionValues":{},""" +
          s""""size":${s.getLen},"modificationTime":${s.getModificationTime},""" +
          s""""dataChange":true}}"""
      }
    LakeIO.writeString(
      new Path(new Path(root, "_delta_log"), f"${0L}%020d.json"),
      actions.mkString("\n"))
  }

  private def parseSchema(s: String): StructType =
    DataType.fromJson(s).asInstanceOf[StructType]

  private case class Checkpoint(version: Option[Long], adds: Seq[AddFile],
                                schemaString: Option[String],
                                partitionColumns: Seq[String])

  /** `_last_checkpoint` → the checkpoint parquet's add/remove state AND
    * its metaData — once a log is compacted, metaData typically lives
    * ONLY here (writers re-emit it on schema change, not per commit) —
    * or an empty Checkpoint for uncompacted logs. */
  private def readCheckpoint(spark: SparkSession, logDir: Path): Checkpoint = {
    val lc = new Path(logDir, "_last_checkpoint")
    if (!LakeIO.exists(lc)) return Checkpoint(None, Seq.empty, None, Seq.empty)
    val m = Json.parse(LakeIO.readString(lc)).asInstanceOf[O].m
    val version = m("version") match { case N(n) => n.toLong; case _ => 0L }
    val parts = m.get("parts") match { case Some(N(n)) => Some(n.toInt); case _ => None }
    val files = parts match {
      case None => Seq(new Path(logDir, f"$version%020d.checkpoint.parquet"))
      case Some(k) => (1 to k).map(i =>
        new Path(logDir, f"$version%020d.checkpoint.$i%010d.$k%010d.parquet"))
    }
    val cp = spark.read.parquet(files.map(_.toString): _*)
    val cols = cp.columns.toSet
    if (cols.contains("protocol")) {
      val pv = cp.filter(col("protocol").isNotNull)
        .select(col("protocol.minReaderVersion")).collect()
      if (pv.exists(r => !r.isNullAt(0) && r.getInt(0) > 1))
        throw new IllegalArgumentException(
          "delta reader protocol > 1 not supported (deletion vectors / column mapping)")
    }
    val (schemaString, partColsCp) =
      if (!cols.contains("metaData")) (None, Seq.empty[String])
      else cp.filter(col("metaData").isNotNull)
        .select(col("metaData.schemaString"), col("metaData.partitionColumns"))
        .collect().headOption match {
          case Some(r) => (Option(r.getString(0)),
            Option(r.getSeq[String](1)).map(_.toSeq).getOrElse(Seq.empty))
          case None => (None, Seq.empty[String])
        }
    val adds =
      if (!cols.contains("add")) Seq.empty
      else cp.filter(col("add").isNotNull)
        .select(col("add.path"), col("add.partitionValues")).collect()
        .map(r => AddFile(r.getString(0),
          Option(r.getMap[String, String](1)).map(_.toMap).getOrElse(Map.empty)))
        .toSeq
    val removed =
      if (!cols.contains("remove")) Set.empty[String]
      else cp.filter(col("remove").isNotNull)
        .select(col("remove.path")).collect().map(_.getString(0)).toSet
    Checkpoint(Some(version), adds.filterNot(a => removed.contains(a.path)),
      schemaString, partColsCp)
  }
}
