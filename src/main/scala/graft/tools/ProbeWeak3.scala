package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Phase-level decomposition of the three judge-flagged compute-scale
  * queries (q26/q44/q49) under Bench-identical session config, so the
  * job-chain cost is attributable to specific sub-plans instead of
  * guessed at. Run: scripts/run.sh graft.tools.ProbeWeak3 /tmp/sf1
  */
object ProbeWeak3 {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/tmp/sf1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.autoBroadcastJoinThreshold", (64L << 20).toString)
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.sql.codegen.cache.maxEntries", "4096")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.Sessions.tune(spark)
    graft.Tables.register(spark, sfDir)

    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"  $label%-28s ${(System.nanoTime() - t0) / 1e9}%6.3f s"); r
    }
    def noop(df: DataFrame): Unit =
      df.write.mode("overwrite").format("noop").save()
    def jobs[A](label: String)(f: => A): A = {
      val sc = spark.sparkContext
      val counter = new java.util.concurrent.atomic.AtomicInteger(0)
      val l = new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(js: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
          counter.incrementAndGet()
      }
      sc.addSparkListener(l)
      val r = f
      Thread.sleep(200) // let listener events drain
      sc.removeSparkListener(l)
      println(f"  $label%-28s jobs=${counter.get}")
      r
    }

    val li = graft.Tables.load(spark, sfDir, "lineitem")
    // warm
    noop(li.groupBy("l_returnflag").agg(count(lit(1))))

    println("== q44 phases ==")
    val hist0 = li
      .select(col("l_returnflag").as("__k"),
        (lit(2) * round(col("l_extendedprice") * 100).cast(LongType)).as("__v"))
      .filter(col("__v").isNotNull)
      .groupBy("__k", "__v").agg(count(lit(1)).as("__c"))
    t("hist-shuffle-only")(noop(hist0))
    val hist = t("hist-checkpoint")(hist0.localCheckpoint(false))
    t("hist-materialize")(hist.count())
    val m = graft.ops.ExactQuantile.medianOfHistogram(hist)
      .select(col("__k"), col("median").as("med2"), col("n"))
    t("median-of-hist")(noop(m))
    val devHist = hist.join(broadcast(m.select(col("__k"), col("med2"))), "__k")
      .groupBy(col("__k"), abs(col("__v") - col("med2")).cast(LongType).as("__v"))
      .agg(sum("__c").as("__c"))
    val md = graft.ops.ExactQuantile.medianOfHistogram(devHist)
      .select(col("__k"), col("median").as("mad2"))
    t("dev-median")(noop(md))
    val full = graft.SparkEntry.queries("q44_mad")
    jobs("q44 full (jobs)")(t("q44 full")(noop(full(spark, sfDir))))

    println("== q26 phases ==")
    val prj0 = li.select(col("l_returnflag"), col("l_partkey"),
      col("l_extendedprice"),
      round(col("l_extendedprice") * 100).cast("long").as("cents"))
    val prj = t("prj-checkpoint")(prj0.localCheckpoint(false))
    t("prj-materialize")(prj.count())
    t("exact-distinct+hll")(noop(prj.select(col("l_returnflag"), col("l_partkey")).distinct()
      .groupBy("l_returnflag")
      .agg(count(lit(1)).as("exact_parts"),
        approx_count_distinct(col("l_partkey")).as("acd"))))
    t("approx-median")(noop(prj.groupBy("l_returnflag")
      .agg(percentile_approx(col("l_extendedprice"), lit(0.5), lit(2000)).as("amed"))))
    t("exact-median-hist")(noop(graft.ops.ExactQuantile.medianByKeyValues(
      prj, col("l_returnflag"), col("cents"))))
    val q26 = graft.SparkEntry.queries("q26_approx_aggs")
    jobs("q26 full (jobs)")(t("q26 full")(noop(q26(spark, sfDir))))

    println("== q49 phases ==")
    val part = graft.Tables.load(spark, sfDir, "part")
    val edges = part
      .select(expr("CAST(FLOOR(p_partkey / 2) AS BIGINT)").as("parent"),
        col("p_partkey").as("child"))
    val h1 = edges.select(col("parent"), col("child"), lit(1L).as("d"))
    val hops = (2 to 4).foldLeft((h1, h1)) { case ((acc, prev), k) =>
      val next = prev.alias("a")
        .join(edges.alias("b"), col("a.child") === col("b.parent"))
        .select(col("a.parent"), col("b.child").as("child"), lit(k.toLong).as("d"))
      (acc.unionByName(next), next)
    }._1
    t("hops-build+count")(println(s"  hops rows = ${hops.count()}"))
    val q49 = graft.SparkEntry.queries("q49_recursive_cte")
    jobs("q49 full (jobs)")(t("q49 full")(noop(q49(spark, sfDir))))
    spark.catalog.clearCache()
    jobs("q49 2nd (jobs)")(t("q49 2nd")(noop(q49(spark, sfDir))))

    spark.stop()
  }
}
