package graft.tools

import org.apache.spark.scheduler._
import org.apache.spark.sql.SparkSession
import java.util.concurrent.atomic.AtomicLong

/** Minimal repro harness for the per-task executorDeserializeTime floor:
  * times a bare range→shuffle→agg query (no graft code) and a parquet
  * scan query at 16 shuffle partitions, printing per-stage task/deser
  * sums across reps. Distinguishes "this environment charges every task
  * ~40 ms to deserialize" from "graft's plans serialize something heavy".
  * Usage: scripts/run.sh graft.tools.ProbeDeser <sfDir>
  */
object ProbeDeser {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val taskMs = new AtomicLong; val deserMs = new AtomicLong
    val resSer = new AtomicLong; val tasks = new AtomicLong
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(e: SparkListenerTaskEnd): Unit = {
        val m = e.taskMetrics
        if (m != null) {
          taskMs.addAndGet(e.taskInfo.duration)
          deserMs.addAndGet(m.executorDeserializeTime)
          resSer.addAndGet(m.resultSerializationTime)
          tasks.incrementAndGet()
        }
      }
    })
    def timed(label: String)(f: => Unit): Unit = {
      for (rep <- 1 to 3) {
        taskMs.set(0); deserMs.set(0); resSer.set(0); tasks.set(0)
        val t0 = System.nanoTime()
        f
        val dt = (System.nanoTime() - t0) / 1e9
        Thread.sleep(200)
        println(f"$label rep$rep wall=$dt%6.3f tasks=${tasks.get}%4d taskSum=${taskMs.get / 1e3}%7.3f deserSum=${deserMs.get / 1e3}%7.3f resSer=${resSer.get / 1e3}%6.3f")
      }
    }
    import spark.implicits._
    timed("range-agg     ") {
      spark.range(1000000).groupBy(($"id" % 97).as("k")).count()
        .write.mode("overwrite").format("noop").save()
    }
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
    timed("parquet-agg   ") {
      li.groupBy("l_returnflag").count()
        .write.mode("overwrite").format("noop").save()
    }
    timed("parquet-join  ") {
      val o = spark.read.parquet(s"$sfDir/orders.parquet")
      li.join(o, li("l_orderkey") === o("o_orderkey"))
        .groupBy("l_returnflag").count()
        .write.mode("overwrite").format("noop").save()
    }
    spark.stop()
  }
}
