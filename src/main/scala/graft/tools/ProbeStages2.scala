package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe: per-stage wall times (listener) for one query, to separate
  * scheduling floor from compute. */
object ProbeStages2 {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val q = args.headOption.getOrElse("dd3_dedup_minhash_lsh")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.autoBroadcastJoinThreshold", (64L << 20).toString)
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
      .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", (8L << 20).toString)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.Tables.register(spark, sfDir)
    val fn = graft.SparkEntry.queries(q)
    if (sys.env.contains("SPARK_GRAFT_EXPLAIN")) {
      println(fn(spark, sfDir).queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted")).take(12000))
      spark.stop(); return
    }
    // warm twice
    fn(spark, sfDir).write.mode("overwrite").format("noop").save()
    fn(spark, sfDir).write.mode("overwrite").format("noop").save()
    val stages = new java.util.concurrent.ConcurrentLinkedQueue[(Int, Long, Int, String)]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        val dur = si.completionTime.getOrElse(0L) - si.submissionTime.getOrElse(0L)
        stages.add((si.stageId, dur, si.numTasks, si.name.take(60)))
      }
    })
    val t0 = System.nanoTime()
    val df = fn(spark, sfDir)
    df.write.mode("overwrite").format("noop").save()
    val wall = (System.nanoTime() - t0) / 1e9
    if (sys.env.contains("SPARK_GRAFT_FINALPLAN"))
      println(df.queryExecution.executedPlan.toString.take(14000))
    Thread.sleep(500)
    println(f"query $q wall $wall%.2f s")
    var sum = 0L
    stages.forEach { case (id, dur, nt, name) =>
      sum += dur
      println(f"  stage $id%3d $dur%5d ms  $nt%3d tasks  $name")
    }
    println(f"  stage-time sum ${sum}ms (overlap possible); gap = ${wall * 1000 - sum}%.0f ms")
    spark.stop()
  }
}
