package graft.tools

import org.apache.spark.scheduler._
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.util.QueryExecutionListener
import java.util.concurrent.atomic.{AtomicInteger, AtomicLong}

/** Floor-cost decomposition across the bench suite: per query, where the
  * wall time goes — DataFrame construction (Scala-side plan building +
  * eager collects), Catalyst phases (parse/analyse/optimise/plan, summed
  * over every QueryExecution the query triggers, including broadcast
  * builds and collect subqueries), and scheduled execution (job count /
  * stage count / task count / summed task time vs wall). The per-query
  * scheduling+planning floor is ~half the sf0.1 bench total; this tool
  * attributes it so the optimization work targets the real slice.
  *
  * Usage: scripts/run.sh graft.tools.ProbeFloor <sfDir> [onlySubstr,...] [conf k=v;...]
  */
object ProbeFloor {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val only = args.drop(1).headOption.filter(_.nonEmpty).map(_.split(',').toSeq)
    val conf = args.drop(2).headOption.getOrElse("")
    var b = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.autoBroadcastJoinThreshold", (64L << 20).toString)
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
      .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", (8L << 20).toString)
      .config("spark.sql.codegen.cache.maxEntries", "4096")
      .config("spark.ui.enabled", "false")
    conf.split(';').filter(_.contains('=')).foreach { kv =>
      val Array(k, v) = kv.split("=", 2); b = b.config(k, v)
    }
    val spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.Sessions.tune(spark)
    graft.Tables.register(spark, sfDir)

    // --- per-query accumulation seams -----------------------------------
    val jobs = new AtomicInteger
    val stages = new AtomicInteger
    val tasks = new AtomicInteger
    val taskMs = new AtomicLong
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit = jobs.incrementAndGet()
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit = {
        stages.incrementAndGet()
        tasks.addAndGet(e.stageInfo.numTasks)
      }
      override def onTaskEnd(e: SparkListenerTaskEnd): Unit =
        if (e.taskInfo != null) taskMs.addAndGet(e.taskInfo.duration)
    })
    val phaseNs = new java.util.concurrent.ConcurrentHashMap[String, AtomicLong]()
    val qeCount = new AtomicInteger
    def addPhases(qe: QueryExecution): Unit = {
      qeCount.incrementAndGet()
      qe.tracker.phases.foreach { case (name, ph) =>
        phaseNs.computeIfAbsent(name, _ => new AtomicLong)
          .addAndGet((ph.endTimeMs - ph.startTimeMs) * 1000000L)
      }
    }
    spark.listenerManager.register(new QueryExecutionListener {
      override def onSuccess(funcName: String, qe: QueryExecution, durationNs: Long): Unit =
        addPhases(qe)
      override def onFailure(funcName: String, qe: QueryExecution, exception: Exception): Unit = ()
    })

    val names = graft.SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.forall(_.exists(n.contains)) }

    // warmup: two full passes (codegen cache, JIT, footers)
    for (_ <- 0 until 2) {
      spark.catalog.clearCache()
      names.foreach { case (_, fn) =>
        fn(spark, sfDir).write.mode("overwrite").format("noop").save()
      }
    }

    case class Row(name: String, wall: Double, build: Double, nQe: Int,
                   nJobs: Int, nStages: Int, nTasks: Int, taskSec: Double,
                   phases: Map[String, Double])
    val rows = scala.collection.mutable.ArrayBuffer[Row]()
    spark.catalog.clearCache()
    names.foreach { case (name, fn) =>
      // settle async listener events from the previous query
      Thread.sleep(150)
      jobs.set(0); stages.set(0); tasks.set(0); taskMs.set(0)
      phaseNs.clear(); qeCount.set(0)
      val t0 = System.nanoTime()
      val df = fn(spark, sfDir)
      val t1 = System.nanoTime()
      df.write.mode("overwrite").format("noop").save()
      val t2 = System.nanoTime()
      Thread.sleep(150)
      val ph = {
        import scala.jdk.CollectionConverters._
        phaseNs.asScala.map { case (k, v) => k -> v.get / 1e9 }.toMap
      }
      rows += Row(name, (t2 - t0) / 1e9, (t1 - t0) / 1e9, qeCount.get,
        jobs.get, stages.get, tasks.get, taskMs.get / 1e3, ph)
    }

    val phaseKeys = rows.flatMap(_.phases.keys).distinct.sorted
    println(f"${"query"}%-28s ${"wall"}%7s ${"build"}%7s ${"qe"}%3s ${"jobs"}%4s ${"stg"}%4s ${"task"}%5s ${"taskSec"}%8s " +
      phaseKeys.map(k => f"$k%12s").mkString(" "))
    rows.foreach { r =>
      println(f"${r.name}%-28s ${r.wall}%7.3f ${r.build}%7.3f ${r.nQe}%3d ${r.nJobs}%4d ${r.nStages}%4d ${r.nTasks}%5d ${r.taskSec}%8.3f " +
        phaseKeys.map(k => f"${r.phases.getOrElse(k, 0.0)}%12.3f").mkString(" "))
    }
    println("---- totals ----")
    println(f"queries=${rows.size} wall=${rows.map(_.wall).sum}%.2f build=${rows.map(_.build).sum}%.2f " +
      f"jobs=${rows.map(_.nJobs).sum} stages=${rows.map(_.nStages).sum} tasks=${rows.map(_.nTasks).sum} " +
      f"taskSec=${rows.map(_.taskSec).sum}%.2f " +
      phaseKeys.map(k => f"$k=${rows.map(_.phases.getOrElse(k, 0.0)).sum}%.2f").mkString(" "))
    spark.stop()
  }
}
