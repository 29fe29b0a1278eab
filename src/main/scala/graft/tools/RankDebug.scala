package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Scratch decomposition of q46's cost at a given SF (delete freely). */
object RankDebug {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/tmp/sf1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def t(label: String)(f: => Any): Unit = {
      val t0 = System.nanoTime(); f
      println(f"$label ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    def b = graft.Tables.load(spark, sfDir, "lineitem")
      .select(col("l_returnflag").as("f"), col("l_orderkey"), col("l_linenumber"),
        round(col("l_extendedprice") * 100).cast(LongType).as("c"))
    def noop(df: org.apache.spark.sql.DataFrame) =
      df.write.mode("overwrite").format("noop").save()
    t("scan+project")(noop(b))
    t("scan+project again")(noop(b))
    t("rdd reservoir-ish pass")(b.rdd.mapPartitions(it => Iterator(it.size)).collect())
    t("shuffle+count")(noop(b.repartition(col("f")).groupBy("f").count()))
    t("global sort by (f,c,ok,ln)")(noop(b.sort("f", "c", "l_orderkey", "l_linenumber")))
    // mirror withRankAndCount's internals piecewise
    locally {
      import org.apache.spark.sql.expressions.Window
      val cols = Seq(("f", true), ("c", true), ("l_orderkey", true), ("l_linenumber", true))
      val proj = b.select(cols.map(c => col(c._1)): _*)
      var sample: Array[org.apache.spark.sql.Row] = null
      t("boundarySample") {
        sample = proj.rdd.mapPartitionsWithIndex { (pid, it) =>
          val rnd = new scala.util.Random(0x9E3779B9L * (pid + 1))
          val res = new Array[org.apache.spark.sql.Row](64)
          var seen = 0
          while (it.hasNext) {
            val r = it.next()
            if (seen < 64) res(seen) = r
            else { val j = rnd.nextInt(seen + 1); if (j < 64) res(j) = r }
            seen += 1
          }
          res.take(math.min(seen, 64)).iterator
        }.collect()
      }
      println(s"  sample rows: ${sample.length}")
      // fake pid: hash-based 64-way (no boundary literals) to isolate
      // the when-tree cost from the window/join machinery
      val fakePid = pmod(hash(col("c")), lit(64)).cast("long")
      val withPid = b.withColumn("__pid", fakePid)
      val wLocal = Window.partitionBy(col("__pid"), col("f"))
        .orderBy(col("c"), col("l_orderkey"), col("l_linenumber"))
      t("window branch (fake pid)")(noop(
        withPid.withColumn("__lr", row_number().over(wLocal).cast("long"))))
      t("count branch (fake pid)")(noop(
        withPid.groupBy(col("__pid"), col("f")).agg(count(lit(1)))))
    }
    t("ntileByKey (scale path)") {
      spark.conf.set("graft.rank.smallBytes", "0")
      noop(graft.ops.DistributedRank.ntileByKey(b, Seq("f"),
        Seq("c", "l_orderkey", "l_linenumber"), k = 10))
      spark.conf.unset("graft.rank.smallBytes")
    }
    println(s"estBytes(b) = ${b.queryExecution.optimizedPlan.stats.sizeInBytes}")
    t("full q46")(noop(graft.SparkEntry.queries("q46_equidepth_bins")(spark, sfDir)))
    t("ntileByKey textbook (forced)") {
      spark.conf.set("graft.rank.smallBytes", "1000000000000")
      noop(graft.ops.DistributedRank.ntileByKey(b, Seq("f"),
        Seq("c", "l_orderkey", "l_linenumber"), k = 10))
      spark.conf.unset("graft.rank.smallBytes")
    }
    spark.stop()
  }
}
