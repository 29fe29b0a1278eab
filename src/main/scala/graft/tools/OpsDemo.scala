package graft.tools

import graft.Tables
import graft.ops.Skew
import graft.streaming.StatefulSessions
import graft.streaming.StatefulSessions.Event
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupStateTimeout, Trigger}

/** Usage demo / smoke driver for the scale helpers on real testdata:
  *   scripts/run.sh graft.tools.OpsDemo <sfDir>
  * 1. salted vs plain aggregation over events.user_id (prints whether
  *    results match), 2. stateful streaming sessionization of the same
  *    events through a file stream (prints session counts).
  */
object OpsDemo {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    implicit val spark: SparkSession = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    import spark.implicits._
    spark.sparkContext.setLogLevel("ERROR")

    val events = Tables.load(spark, sfDir, "events")

    val salted = Skew.saltedCountSum(events, Seq("user_id"), "value", saltBuckets = 16)
      .orderBy("user_id").collect().map(r => (r.getLong(0), r.getLong(1)))
    val plain = events.groupBy("user_id").agg(count(lit(1)).as("n"))
      .orderBy("user_id").collect().map(r => (r.getLong(0), r.getLong(1)))
    println(s"salted-vs-plain: keys=${salted.length} match=${salted.toSeq == plain.toSeq}")

    val tmp = java.nio.file.Files.createTempDirectory("opsdemo").toString
    events.select(col("user_id"), unix_micros(col("ts")).as("tsUs"), col("value"))
      .as[Event].write.parquet(tmp + "/in")
    val stream = spark.readStream
      .schema(implicitly[org.apache.spark.sql.Encoder[Event]].schema)
      .parquet(tmp + "/in").as[Event]
    val q = StatefulSessions.sessionize(stream, gapUs = 1800L * 1000000L,
        flushTimeout = GroupStateTimeout.NoTimeout)
      .writeStream.outputMode("append").format("memory").queryName("sess")
      .trigger(Trigger.ProcessingTime("1 second")).start()
    q.processAllAvailable(); q.stop()
    val n = spark.sql("SELECT COUNT(*) AS n, COUNT(DISTINCT user_id) AS users FROM sess").collect()(0)
    println(s"streaming-sessions: closed=${n.getLong(0)} users=${n.getLong(1)}")
    spark.stop()
  }
}
