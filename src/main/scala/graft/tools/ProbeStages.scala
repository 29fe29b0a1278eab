package graft.tools

import org.apache.spark.scheduler._
import org.apache.spark.sql.SparkSession
import scala.collection.mutable

/** Per-stage wall/task breakdown for a single SparkEntry query — the
  * attribution tool behind the round-18 weak-query work. Prints each
  * stage's task count, total task time, and wall span, plus job spans.
  * Usage: scripts/run.sh graft.tools.ProbeStages <sfDir> <queryName> [conf k=v;...]
  */
object ProbeStages {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val qname = args(1)
    val conf = args.drop(2).headOption.getOrElse("")
    var b = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.autoBroadcastJoinThreshold", (64L << 20).toString)
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.sql.codegen.cache.maxEntries", "4096")
      .config("spark.ui.enabled", "false")
    conf.split(';').filter(_.contains('=')).foreach { kv =>
      val Array(k, v) = kv.split("=", 2); b = b.config(k, v)
    }
    val spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.Sessions.tune(spark)
    graft.Tables.register(spark, sfDir)

    val fn = graft.SparkEntry.queries(qname)
    // warm run
    fn(spark, sfDir).write.mode("overwrite").format("noop").save()
    spark.catalog.clearCache()

    case class St(id: Int, name: String, tasks: Int, var taskMs: Long,
                  var t0: Long, var t1: Long, var deserMs: Long = 0L,
                  var gcMs: Long = 0L, var launchSpreadMs: Long = 0L)
    val stages = mutable.LinkedHashMap[Int, St]()
    val jobs = mutable.LinkedHashMap[Int, (Long, Long)]()
    val taskAgg = mutable.HashMap[Int, (Long, Long, Long, Long, Long)]() // stage -> (taskMs, deserMs, gcMs, minLaunch, maxLaunch)
    val l = new SparkListener {
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit = {
        val si = e.stageInfo
        val (tm, dm, gm, l0, l1) = taskAgg.getOrElse(si.stageId, (0L, 0L, 0L, 0L, 0L))
        val st = St(si.stageId, si.name.takeWhile(_ != '\n').take(70),
          si.numTasks, tm,
          si.submissionTime.getOrElse(0L), si.completionTime.getOrElse(0L),
          dm, gm, l1 - l0)
        stages(si.stageId) = st
      }
      override def onTaskEnd(e: SparkListenerTaskEnd): Unit = {
        val m = e.taskMetrics
        val ti = e.taskInfo
        if (m != null && ti != null) {
          val (tm, dm, gm, l0, l1) = taskAgg.getOrElse(e.stageId, (0L, 0L, 0L, Long.MaxValue, 0L))
          taskAgg(e.stageId) = (tm + ti.duration, dm + m.executorDeserializeTime,
            gm + m.jvmGCTime, math.min(l0, ti.launchTime), math.max(l1, ti.launchTime))
        }
      }
      override def onJobStart(e: SparkListenerJobStart): Unit =
        jobs(e.jobId) = (System.currentTimeMillis, 0L)
      override def onJobEnd(e: SparkListenerJobEnd): Unit =
        jobs.get(e.jobId).foreach(v => jobs(e.jobId) = (v._1, System.currentTimeMillis))
    }
    spark.sparkContext.addSparkListener(l)
    val t0 = System.nanoTime()
    fn(spark, sfDir).write.mode("overwrite").format("noop").save()
    val wall = (System.nanoTime() - t0) / 1e9
    Thread.sleep(300)
    println(f"TOTAL $qname $wall%.3f s (2nd run, cleared cache)")
    println("jobs:")
    jobs.foreach { case (id, (a, z)) =>
      println(f"  job $id%3d  ${(z - a) / 1e3}%7.3f s")
    }
    println("stages (wall span / tasks):")
    stages.values.toSeq.sortBy(_.t0).foreach { s =>
      println(f"  stage ${s.id}%4d ${(s.t1 - s.t0) / 1e3}%7.3f s  tasks=${s.tasks}%3d taskSum=${s.taskMs / 1e3}%7.3f deser=${s.deserMs / 1e3}%6.3f gc=${s.gcMs / 1e3}%6.3f launchSpread=${s.launchSpreadMs / 1e3}%6.3f  ${s.name}")
    }
    spark.stop()
  }
}
