package graft

import graft.ops.Skew
import graft.streaming.StatefulSessions
import graft.streaming.StatefulSessions.{Event, Session}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Specs for the scale helpers: salted aggregation equivalence and
  * stateful streaming sessionization. */
class OpsSpec extends SparkSpec {
  import spark.implicits._

  test("salted aggregation matches plain aggregation on skewed data") {
    // heavy hitter: key 'hot' holds 90% of rows
    val rows = (1 to 900).map(i => ("hot", i.toDouble)) ++ (1 to 100).map(i => (s"k${i % 10}", i.toDouble))
    val df = rows.toDF("k", "v").repartition(8)
    val salted = Skew.saltedCountSum(df, Seq("k"), "v", saltBuckets = 16)
      .orderBy("k").collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    val plain = df.groupBy("k").agg(count(lit(1)).as("n"), sum("v").as("total"))
      .orderBy("k").collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    assert(salted.toSeq === plain.toSeq)
  }

  test("salted join matches plain join on skewed keys") {
    import spark.implicits._
    // 90% of big rows share one hot key
    val big = (0 until 1000).map(i => (if (i < 900) "hot" else s"k${i % 7}", i.toLong))
      .toDF("k", "v")
    val small = Seq(("hot", 1.0), ("k0", 2.0), ("k3", 3.0)).toDF("k", "w")
    val plain = big.join(small, Seq("k"), "inner")
      .select("k", "v", "w").collect().map(_.toSeq).toSet
    val salted = ops.Skew.saltedJoin(big, small, "k", saltBuckets = 8)
      .select("k", "v", "w").collect().map(_.toSeq).toSet
    assert(salted === plain)
    assert(salted.count(_.head == "hot") === 900) // the hot key fully joined
  }

  test("histogram+refine exact median matches built-in percentile") {
    // adversarial shapes: odd/even counts, heavy ties, values straddling
    // bucket boundaries (shift 4 → bucket width 16), negatives, and a
    // single-row group
    val rnd = new scala.util.Random(42)
    val rows = Seq.newBuilder[(String, Long)]
    for (g <- 0 until 7; _ <- 0 until (if (g == 6) 1 else 500 + g)) {
      val v = g match {
        case 0 => rnd.nextInt(1000).toLong           // dense, many ties
        case 1 => rnd.nextInt(40).toLong             // extreme ties
        case 2 => rnd.nextInt(100000).toLong - 50000 // negatives
        case 3 => (rnd.nextInt(8) * 16).toLong       // exactly on boundaries
        case 4 => rnd.nextLong() % 1000000
        case 5 => 17L                                // constant group
        case _ => 99L
      }
      rows += ((s"g$g", v))
    }
    // null values must be ignored, exactly like built-in percentile
    val data = rows.result().map { case (k, v) => (k, java.lang.Long.valueOf(v)) } ++
      Seq(("g0", null: java.lang.Long), ("g2", null: java.lang.Long))
    val df = data.toDF("k", "v")
    val got = graft.ops.ExactQuantile.medianByKey(df, col("k"), col("v"), bucketShift = 4)
      .select(col("__k").as("k"), col("median")).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    val gotValues = graft.ops.ExactQuantile.medianByKeyValues(df, col("k"), col("v"))
      .select(col("__k").as("k"), col("median")).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    val want = df.groupBy("k").agg(expr("percentile(v, 0.5)").as("m")).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(got.keySet === want.keySet)
    assert(gotValues.keySet === want.keySet)
    for ((k, w) <- want) {
      assert(got(k) === w, s"group $k (bucketed)")
      assert(gotValues(k) === w, s"group $k (single-scan values)")
    }
  }

  test("stateful streaming sessionization closes sessions on gaps") {
    implicit val s = spark
    val inDir = tmpDir("graft-sess-in")
    // user 1: two sessions (gap > 30 min); user 2: one session
    Seq(
      Event(1L, 0L, 1.0), Event(1L, 60_000_000L, 2.0),            // session A: 2 events
      Event(1L, 4_000_000_000L, 5.0),                             // session B (gap > 30min)
      Event(2L, 100L, 7.0))
      .toDS().write.parquet(inDir + "/b1")
    val stream = spark.readStream.schema(implicitly[org.apache.spark.sql.Encoder[Event]].schema)
      .parquet(inDir + "/b1").as[Event]
    val sessions = StatefulSessions.sessionize(stream, gapUs = 1_800_000_000L,
      flushTimeout = org.apache.spark.sql.streaming.GroupStateTimeout.NoTimeout)
    val q = sessions.writeStream.outputMode("append")
      .format("memory").queryName("sessout")
      .trigger(Trigger.ProcessingTime("1 second")).start()
    q.processAllAvailable(); q.stop()
    // only sessions CLOSED by a later event are emitted (open ones wait
    // for timeout): user 1 session A
    val emitted = spark.sql("SELECT * FROM sessout ORDER BY user_id, start_us")
      .as[Session].collect().toSeq
    assert(emitted === Seq(Session(1L, 0L, 60_000_000L, 2L, 3.0)))
  }
}
