package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Dev probe: candidate rewrites of the slow bench queries (tx4, tx5, tx8,
  * q26) against their current implementations, same session config as
  * Bench, min-of-3 per variant. */
object TxProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.autoBroadcastJoinThreshold", (64L << 20).toString)
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
      .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", (8L << 20).toString)
      .config("spark.sql.codegen.cache.maxEntries", "4096")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.Tables

    def noop(df: DataFrame): Unit = df.write.mode("overwrite").format("noop").save()
    def bench(label: String)(f: => DataFrame): Unit = {
      val times = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); noop(f); (System.nanoTime() - t0) / 1e9
      }
      println(f"$label%-22s min=${times.min}%.2f  runs=${times.map(t => f"$t%.2f").mkString(",")}")
    }

    val docs = Tables.load(spark, sfDir, "documents")
    val li = Tables.load(spark, sfDir, "lineitem")
    docs.limit(1).count(); li.limit(1).count()

    // ---- tx4 current vs bounded-agg --------------------------------------
    bench("tx4_cur") {
      graft.ops.TextAnalysis.fingerprint(docs, "doc_id", "text").orderBy("doc_id")
    }
    def shingleRows(n: Int): DataFrame = docs
      .repartition(32)
      .select(col("doc_id"), split(col("text"), " ").as("w"))
      .filter(size(col("w")) >= n)
      .select(col("doc_id"), col("w"),
        explode(sequence(lit(1), size(col("w")) - (n - 1))).as("i"))
      .select(col("doc_id"),
        concat_ws(" ", (0 until n).map(k => element_at(col("w"), col("i") + k)): _*).as("shingle"))
    bench("tx4_minK") {
      shingleRows(5)
        .groupBy("doc_id")
        .agg(array_join(graft.functions.MinKMd5Aggregate.min_k_md5(col("shingle"), 3), "").as("fingerprint"))
        .orderBy("doc_id")
    }

    // ---- tx8 current vs hashed-shingle single-pass -----------------------
    val split0 = graft.ops.TextAnalysis.trainSplit(docs, "doc_id", "graft")
    bench("tx8_cur") {
      graft.ops.TextAnalysis.contaminationCheck(split0, "doc_id", "text", "split", 5, 0.5)
        .orderBy("doc_id")
    }
    def tx8v2: DataFrame = {
      val base = split0.filter(col("split") =!= "val")
      val sh = base
        .repartition(32)
        .select(col("doc_id"), col("split"), org.apache.spark.sql.functions.split(col("text"), " ").as("w"))
        .filter(size(col("w")) >= 5)
        .select(col("doc_id"), col("split"), col("w"),
          explode(sequence(lit(1), size(col("w")) - 4)).as("i"))
        .select(col("doc_id"), col("split"),
          xxhash64(concat_ws(" ", (0 until 5).map(k => element_at(col("w"), col("i") + k)): _*)).as("sh64"))
        .groupBy("doc_id", "split", "sh64").agg(lit(1).as("__one")).drop("__one")
      val tr = sh.filter(col("split") === "train").select("sh64").distinct()
        .withColumn("__in_train", lit(1))
      sh.filter(col("split") === "test")
        .join(tr, Seq("sh64"), "left")
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_sh"), sum(coalesce(col("__in_train"), lit(0))).as("n_overlap"))
        .withColumn("overlap_frac", col("n_overlap").cast(DoubleType) / col("n_sh"))
        .withColumn("contaminated", col("overlap_frac") >= 0.5)
    }
    bench("tx8_hash")(tx8v2.orderBy("doc_id"))
    def tx8v3: DataFrame = {
      val base = split0.filter(col("split") =!= "val")
      val sh = base
        .repartition(32)
        .select(col("doc_id"), col("split"), org.apache.spark.sql.functions.split(col("text"), " ").as("w"))
        .filter(size(col("w")) >= 5)
        .select(col("doc_id"), col("split"), col("w"),
          explode(sequence(lit(1), size(col("w")) - 4)).as("i"))
        .select(col("doc_id"), col("split"),
          xxhash64(concat_ws(" ", (0 until 5).map(k => element_at(col("w"), col("i") + k)): _*)).as("sh64"))
      sh.groupBy("sh64")
        .agg(max(when(col("split") === "train", 1).otherwise(0)).as("in_train"),
          collect_set(when(col("split") === "test", col("doc_id"))).as("test_ids"))
        .filter(size(col("test_ids")) > 0)
        .select(col("in_train"), explode(col("test_ids")).as("doc_id"))
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_sh"), sum(col("in_train")).as("n_overlap"))
        .withColumn("overlap_frac", col("n_overlap").cast(DoubleType) / col("n_sh"))
        .withColumn("contaminated", col("overlap_frac") >= 0.5)
    }
    bench("tx8_grpset")(tx8v3.orderBy("doc_id"))

    // ---- q26 current vs pre-aggregated exact paths -----------------------
    bench("q26_cur") {
      val sketches = li.groupBy("l_returnflag")
        .agg(approx_count_distinct(col("l_partkey")).as("acd"),
          percentile_approx(col("l_extendedprice"), lit(0.5), lit(10000)).as("amed"),
          expr("percentile(l_extendedprice, 0.5)").as("emed"))
      val exact = li.select(col("l_returnflag"), col("l_partkey")).distinct()
        .groupBy("l_returnflag").agg(count(lit(1)).as("exact_parts"))
      exact.join(sketches, "l_returnflag")
        .select(col("l_returnflag"), col("exact_parts"),
          (abs(col("acd") - col("exact_parts")) <= col("exact_parts") * 0.10).as("cd_ok"),
          (abs(col("amed") - col("emed")) <= col("emed") * 0.05).as("med_ok"))
        .orderBy("l_returnflag")
    }
    bench("q26_preagg") {
      // exact distinct + HLL on the SAME distinct pass (HLL is duplicate-
      // insensitive, so sketching the distinct set gives the same estimate)
      val exact = li.select(col("l_returnflag"), col("l_partkey")).distinct()
        .groupBy("l_returnflag")
        .agg(count(lit(1)).as("exact_parts"),
          approx_count_distinct(col("l_partkey")).as("acd"))
      // exact median from a value-frequency pre-aggregation
      val med = li.groupBy(col("l_returnflag"), col("l_extendedprice"))
        .agg(count(lit(1)).as("cnt"))
        .groupBy("l_returnflag")
        .agg(expr("percentile(l_extendedprice, 0.5D, cnt)").as("emed"))
      val amed = li.groupBy("l_returnflag")
        .agg(percentile_approx(col("l_extendedprice"), lit(0.5), lit(1000)).as("amed"))
      exact.join(med, "l_returnflag").join(amed, "l_returnflag")
        .select(col("l_returnflag"), col("exact_parts"),
          (abs(col("acd") - col("exact_parts")) <= col("exact_parts") * 0.10).as("cd_ok"),
          (abs(col("amed") - col("emed")) <= col("emed") * 0.05).as("med_ok"))
        .orderBy("l_returnflag")
    }

    // ---- tx5: current + plan dump ---------------------------------------
    bench("tx5_cur") {
      graft.ops.TextAnalysis.winnowFingerprints(docs, "doc_id", "text", 4, 8)
        .orderBy("doc_id", "pos", "fp")
    }
    // distinct BEFORE projecting (on doc_id, sel) so the aggregation can
    // reuse the window's doc_id partitioning instead of a fresh exchange
    def tx5v2: DataFrame = {
      val kg = docs
        .repartition(32)
        .select(col("doc_id"), split(col("text"), " ").as("wd"))
        .filter(size(col("wd")) >= 4)
        .select(col("doc_id"),
          explode(sequence(lit(1), size(col("wd")) - 3)).as("i"),
          col("wd"))
        .select(col("doc_id"), col("i"),
          substring(md5(concat_ws(" ",
            (0 until 4).map(j => element_at(col("wd"), col("i") + j)): _*)), 1, 16).as("h"))
      val win = Window.partitionBy("doc_id").orderBy("i").rowsBetween(-7, 0)
      kg
        .withColumn("key",
          concat(col("h"), lpad((lit(99999999) - col("i")).cast(StringType), 8, "0")))
        .withColumn("sel", min("key").over(win))
        .filter(col("i") >= 8)
        .groupBy("doc_id", "sel").agg(lit(1).as("__one"))
        .select(col("doc_id"),
          (lit(99999999L) - substring(col("sel"), 17, 8).cast(LongType)).as("pos"),
          substring(col("sel"), 1, 16).as("fp"))
    }
    bench("tx5_grpdist")(tx5v2.orderBy("doc_id", "pos", "fp"))

    println("---- tx5 current plan ----")
    graft.ops.TextAnalysis.winnowFingerprints(docs, "doc_id", "text", 4, 8).explain("formatted")
    println("---- tx5 v2 plan ----")
    tx5v2.explain("formatted")

    spark.stop()
  }
}
