package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** 10× scale probe for this round's operators: k-core peeling and
  * shortest paths (distributed loops forced — user replication densifies
  * the same item set), KMV sketch intersection and fused percentiles
  * (lineitem ×N), the cross-source minhash matrix and session path
  * mining (corpus/events ×N). The claim under test is the usual one:
  * wall clock grows sub-quadratically because every plan is bounded by
  * keys/buckets/sketch sizes, not by pair products.
  */
object ProbeScaleR9 {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val mult = args.drop(1).headOption.map(_.toInt).getOrElse(10)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
      .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", (16L << 20).toString)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def t[A](label: String)(f: => A): Unit = {
      val t0 = System.nanoTime(); f
      println(f"$label ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    val ev0 = graft.Tables.load(spark, sfDir, "events")
    val docs0 = graft.Tables.load(spark, sfDir, "documents")
    val li0 = graft.Tables.load(spark, sfDir, "lineitem")
      .select("l_orderkey", "l_returnflag", "l_extendedprice")
    for (m <- Seq(1, mult)) {
      val ev = spark.range(m).crossJoin(ev0)
        .select((col("event_id") + col("id") * 10000000L).as("event_id"),
          col("ts"), (col("user_id") + col("id") * 1000L).as("user_id"),
          col("event_type"), col("value"), col("props"))
        .cache()
      val docs = spark.range(m).crossJoin(docs0)
        .select((col("doc_id") + col("id") * 1000000L).as("doc_id"),
          concat(col("text"), lit(" rep"), col("id")).as("text"),
          col("lang"), col("source"), col("n_chars"))
        .cache()
      val li = spark.range(m).crossJoin(li0)
        .select((col("l_orderkey") + col("id") * 100000000L).as("l_orderkey"),
          col("l_returnflag"), col("l_extendedprice"))
        .cache()
      println(s"== x$m: events ${ev.count()}, docs ${docs.count()}, lineitem ${li.count()}")

      t(s"gr4 k-core x$m (distributed loop)") {
        val bip = ev.filter(col("event_type") === "view")
          .select(concat(lit("u:"), col("user_id").cast("string")).as("a"),
            concat(lit("i:"),
              get_json_object(col("props"), "$.k").cast("long").cast("string")).as("b"))
        graft.ops.Graph.kCorePeel(bip, "a", "b", k = 11, rounds = 12,
            localEdgeLimit = 0L)
          .write.mode("overwrite").format("noop").save()
      }
      t(s"gr5 shortest paths x$m (distributed loop)") {
        val edges = graft.ops.Graph.itemTransitionEdges(ev).localCheckpoint(false)
        val tot = edges.agg(sum("w").as("s"), count(lit(1)).as("c"))
        val se = edges.crossJoin(broadcast(tot))
          .where(lit(2) * col("w") * col("c") > lit(3) * col("s"))
          .select(col("src"), col("dst"), expr("1000000L div w").as("cost"))
        graft.ops.Graph.shortestPaths(se, "src", "dst", "cost",
            start = 0L, maxDepth = 6, localEdgeLimit = 0L)
          .write.mode("overwrite").format("noop").save()
      }
      t(s"q42 KMV sketch intersect x$m") {
        import graft.functions.MinKMd5Aggregate.min_k_md5
        val tt = li.where(col("l_returnflag").isin("A", "R"))
          .select(col("l_returnflag").as("f"), col("l_orderkey").cast("string").as("ks"))
        tt.agg(
            min_k_md5(when(col("f") === "A", col("ks")), 256).as("ska"),
            min_k_md5(when(col("f") === "R", col("ks")), 256).as("skr"),
            min_k_md5(col("ks"), 256).as("sku"))
          .write.mode("overwrite").format("noop").save()
      }
      t(s"q45 fused p90/p99 x$m") {
        val b = li.select(col("l_returnflag").as("f"),
          round(col("l_extendedprice") * 100).cast("long").as("c"))
        graft.ops.ExactQuantile.rankStatsByKey(b, col("f"), col("c"), Seq(0.90, 0.99))
          .write.mode("overwrite").format("noop").save()
      }
      t(s"dd13 source minhash matrix x$m") {
        val spread = docs.repartition(32, col("doc_id"))
        val sigRows = spread.select(col("source"),
            graft.functions.TextExprs.minhash_sig_hex(col("text"), 5, 16).as("mh"))
          .select(col("source"), posexplode_outer(col("mh")).as(Seq("j", "h")))
          .filter(col("h").isNotNull)
        val sig = sigRows.groupBy("source", "j").agg(min("h").as("h"))
          .groupBy("source")
          .agg(expr("transform(array_sort(collect_list(struct(j, h))), x -> x.h)").as("sig"))
          .localCheckpoint(false)
        val a = sig.select(col("source").as("src1"), col("sig").as("s1"))
        val bb = sig.select(col("source").as("src2"), col("sig").as("s2"))
        a.join(bb, col("src1") < col("src2"))
          .select(col("src1"), col("src2"),
            expr("CAST(size(filter(zip_with(s1, s2, (x, y) -> x = y), v -> v)) AS BIGINT)").as("matches"))
          .write.mode("overwrite").format("noop").save()
      }
      t(s"ev16 session paths x$m") {
        import org.apache.spark.sql.expressions.Window
        val w = Window.partitionBy("user_id").orderBy("tus", "event_id")
        val sess = ev
          .select(col("user_id"), col("event_id"), col("event_type"),
            unix_micros(col("ts")).as("tus"))
          .withColumn("prev", lag("tus", 1).over(w))
          .withColumn("brk",
            when(col("prev").isNull || col("tus") - col("prev") > 1800000000L, 1).otherwise(0))
          .withColumn("session_id",
            sum("brk").over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)).cast("long"))
          .withColumn("rn", row_number().over(
            Window.partitionBy("user_id", "session_id").orderBy("tus", "event_id")))
          .where(col("rn") <= 5)
        sess.groupBy("user_id", "session_id")
          .agg(expr("concat_ws('>', transform(array_sort(collect_list(struct(rn, event_type))), x -> x.event_type))").as("path"))
          .groupBy("path").agg(count(lit(1)).as("n_sessions"))
          .orderBy(col("n_sessions").desc, col("path")).limit(20)
          .write.mode("overwrite").format("noop").save()
      }
      ev.unpersist(); docs.unpersist(); li.unpersist()
    }
    spark.stop()
  }
}
