package graft

import graft.lake.GraftTable
import graft.streaming.StreamingOps
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types._

/** Structured Streaming specs: file-source tumbling aggregation into a
  * memory sink, and the continuous CDC-upsert path via foreachBatch. */
class StreamingSpec extends SparkSpec {
  import spark.implicits._

  private val eventSchema = StructType(Seq(
    StructField("ts", TimestampType), StructField("event_type", StringType),
    StructField("value", DoubleType)))

  test("tumbling window aggregation over a file stream (memory sink)") {
    val dir = tmpDir("graft-stream-in")
    Seq(
      ("2024-01-01 00:01:00", "click", 1.0),
      ("2024-01-01 00:02:00", "click", 2.0),
      ("2024-01-01 00:07:00", "view", 5.0))
      .toDF("s", "event_type", "value")
      .select(to_timestamp(col("s")).as("ts"), col("event_type"), col("value"))
      .write.parquet(dir + "/batch1")
    val stream = StreamingOps.parquetStream(spark, eventSchema, dir + "/batch1")
    val agg = StreamingOps.tumblingAgg(stream, "5 minutes", "10 minutes")
    val q = agg.writeStream.outputMode("complete")
      .format("memory").queryName("winout")
      .trigger(Trigger.ProcessingTime("1 second")).start()
    q.processAllAvailable(); q.stop()
    val rows = spark.sql("SELECT event_type, n, total_value FROM winout ORDER BY win_start, event_type")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(rows === Seq(("click", 2L, 3.0), ("view", 1L, 5.0)))
  }

  test("continuous CDC upsert stream merges micro-batches into a graft table") {
    val inDir = tmpDir("graft-cdc-in")
    val ckDir = tmpDir("graft-cdc-ck")
    val t = GraftTable.create(spark, tmpDir("graft-cdc-table"),
      StructType(Seq(StructField("id", LongType), StructField("v", DoubleType))))
    val changeSchema = StructType(Seq(
      StructField("old_id", LongType), StructField("new_id", LongType),
      StructField("v", DoubleType), StructField("_seq", LongType)))
    Seq((Option.empty[Long], Some(1L), 10.0, 1L), (Option.empty[Long], Some(2L), 20.0, 2L))
      .toDF("old_id", "new_id", "v", "_seq").write.parquet(inDir + "/b1")
    val stream = spark.readStream.schema(changeSchema).parquet(inDir + "/b1")
    val q = StreamingOps.cdcUpsertStream(stream, t, Seq("id"), Seq("v"), ckDir,
      Trigger.ProcessingTime("1 second"))
    q.processAllAvailable(); q.stop()
    val rows = t.read().orderBy("id").collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(rows === Seq((1L, 10.0), (2L, 20.0)))
  }
}
