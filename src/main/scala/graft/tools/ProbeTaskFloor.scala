package graft.tools

import org.apache.spark.scheduler._
import org.apache.spark.sql.SparkSession
import java.util.concurrent.atomic.AtomicLong

/** Isolates the per-task fixed cost: bare RDD tasks (no SQL, no parquet,
  * no shuffle) vs SQL-over-range vs parquet-scan tasks, at several task
  * counts. Tells how much of the ~40-70 ms/task bench floor is scheduler/
  * environment (irreducible) vs SQL task setup (addressable).
  * Usage: scripts/run.sh graft.tools.ProbeTaskFloor <sfDir>
  */
object ProbeTaskFloor {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sc = spark.sparkContext
    val taskMs = new AtomicLong; val deserMs = new AtomicLong
    val runMs = new AtomicLong; val tasks = new AtomicLong
    sc.addSparkListener(new SparkListener {
      override def onTaskEnd(e: SparkListenerTaskEnd): Unit = {
        val m = e.taskMetrics
        if (m != null) {
          taskMs.addAndGet(e.taskInfo.duration)
          deserMs.addAndGet(m.executorDeserializeTime)
          runMs.addAndGet(m.executorRunTime)
          tasks.incrementAndGet()
        }
      }
    })
    def timed(label: String)(f: => Unit): Unit = {
      var best = (Double.MaxValue, 0L, 0L, 0L, 0L)
      for (_ <- 1 to 5) {
        taskMs.set(0); deserMs.set(0); runMs.set(0); tasks.set(0)
        val t0 = System.nanoTime()
        f
        val dt = (System.nanoTime() - t0) / 1e9
        Thread.sleep(120)
        if (dt < best._1) best = (dt, tasks.get, taskMs.get, deserMs.get, runMs.get)
      }
      println(f"$label wall=${best._1}%6.3f tasks=${best._2}%4d taskSum=${best._3 / 1e3}%7.3f deser=${best._4 / 1e3}%6.3f run=${best._5 / 1e3}%6.3f perTaskMs=${best._3.toDouble / math.max(1, best._2)}%6.1f")
    }
    timed("rdd-noop-32t   ") { sc.parallelize(1 to 32, 32).foreach(_ => ()) }
    timed("rdd-noop-256t  ") { sc.parallelize(1 to 256, 256).foreach(_ => ()) }
    timed("rdd-shuffle-32t") { sc.parallelize(1 to 32, 16).map(i => (i, i)).reduceByKey(_ + _, 16).foreach(_ => ()) }
    timed("sql-range-32t  ") { spark.range(0, 32, 1, 32).write.mode("overwrite").format("noop").save() }
    timed("sql-range-agg  ") { spark.range(0, 1000, 1, 16).groupBy((org.apache.spark.sql.functions.col("id") % 7).as("k")).count().write.mode("overwrite").format("noop").save() }
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
    timed("parquet-scan   ") { li.select(org.apache.spark.sql.functions.col("l_returnflag")).write.mode("overwrite").format("noop").save() }
    spark.stop()
  }
}
