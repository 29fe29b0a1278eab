package graft.queries

import graft.{QueryDef, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Time-series / event-stream queries over `events` (batch semantics of
  * the streaming operators: tumbling windows, sessionization). The same
  * aggregations run under Structured Streaming via `readStream` — see
  * graft.streaming.StreamingOps — these batch twins are the oracle-checked
  * correctness anchors.
  */
object Events {

  private def ev(s: org.apache.spark.sql.SparkSession, d: String) = Tables.load(s, d, "events")

  /** ev15: EWMA span (α = 1/2 truncated to the last N observations).
    * Values are nonnegative milli-units, so num ≥ 0 and DuckDB's floor-//
    * agrees with Spark's truncating div on every normalization. */
  private val EwmaN = 8
  /** ev17: CUSUM target level (milli-units, slightly above the value
    * mean ≈ 49 630 so only sustained upward drift accumulates) and the
    * decision threshold h (≈ 10 above-target steps). */
  private val CusumTarget = 55000L
  private val CusumH = 500000L

  val defs: Seq[QueryDef] = Seq(

    QueryDef("ev1_tumbling_hour",
      """SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour_start, event_type,
        |  CAST(COUNT(*) AS BIGINT) AS n,
        |  CAST(SUM(CAST(value AS DECIMAL(25,6))) AS DOUBLE) AS total_value,
        |  MIN(value) AS min_v, MAX(value) AS max_v
        |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin) { (s, d) =>
      ev(s, d)
        .groupBy(
          date_format(date_trunc("hour", col("ts")), "yyyy-MM-dd HH:mm:ss").as("hour_start"),
          col("event_type"))
        .agg(
          count(lit(1)).as("n"),
          sum(col("value").cast(DecimalType(25, 6))).cast(DoubleType).as("total_value"),
          min("value").as("min_v"),
          max("value").as("max_v"))
        .orderBy("hour_start", "event_type")
    },

    QueryDef("ev2_sessionize",
      """WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS tus FROM events),
        |l AS (SELECT *, LAG(tus) OVER (PARTITION BY user_id ORDER BY tus, event_id) AS prev FROM e),
        |f AS (SELECT *, CASE WHEN prev IS NULL OR tus - prev > 1800000000 THEN 1 ELSE 0 END AS brk FROM l),
        |s AS (SELECT *, SUM(brk) OVER (PARTITION BY user_id ORDER BY tus, event_id
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id FROM f)
        |SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
        |  CAST(COUNT(*) AS BIGINT) AS n_events,
        |  CAST(MIN(tus) AS BIGINT) AS start_us, CAST(MAX(tus) AS BIGINT) AS end_us
        |FROM s GROUP BY user_id, session_id
        |ORDER BY user_id, session_id""".stripMargin) { (s, d) =>
      val w = Window.partitionBy("user_id").orderBy("tus", "event_id")
      ev(s, d)
        .select(col("user_id"), col("event_id"), unix_micros(col("ts")).as("tus"))
        .withColumn("prev", lag("tus", 1).over(w))
        .withColumn("brk",
          when(col("prev").isNull || col("tus") - col("prev") > 1800000000L, 1).otherwise(0))
        .withColumn("session_id",
          sum("brk").over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)).cast(LongType))
        .groupBy("user_id", "session_id")
        .agg(count(lit(1)).as("n_events"),
          min("tus").as("start_us"), max("tus").as("end_us"))
        .orderBy("user_id", "session_id")
    },

    QueryDef("ev3_window_10min",
      """SELECT CAST((epoch_us(ts) // 600000000) * 600000000 AS BIGINT) AS win_start_us, event_type,
        |  CAST(COUNT(*) AS BIGINT) AS n,
        |  CAST(SUM(CAST(value AS DECIMAL(25,6))) AS DOUBLE) AS total_value
        |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin) { (s, d) =>
      // window() is the Structured-Streaming tumbling-window primitive;
      // on batch input it produces the same epoch-aligned buckets.
      ev(s, d)
        .groupBy(window(col("ts"), "10 minutes"), col("event_type"))
        .agg(count(lit(1)).as("n"),
          sum(col("value").cast(DecimalType(25, 6))).cast(DoubleType).as("total_value"))
        .select(unix_micros(col("window.start")).as("win_start_us"),
          col("event_type"), col("n"), col("total_value"))
        .orderBy("win_start_us", "event_type")
    },

    // top-k per time window: the standard "who dominated each hour"
    // analytics shape — windowed aggregate then per-window rank. One
    // groupBy shuffle + one rank window, both keyed on the hour.
    QueryDef("ev6_topk_per_window",
      """WITH h AS (SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour_start,
        |             user_id, CAST(COUNT(*) AS BIGINT) AS n
        |           FROM events GROUP BY 1, 2),
        |r AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY hour_start ORDER BY n DESC, user_id) AS rnk FROM h)
        |SELECT hour_start, CAST(user_id AS BIGINT) AS user_id, n, CAST(rnk AS BIGINT) AS rnk
        |FROM r WHERE rnk <= 2 ORDER BY hour_start, rnk""".stripMargin) { (s, d) =>
      // per-window leaders via the bounded top-k aggregate (map-side ≤k
      // partials; counts < 2^53 are exact as double scores) instead of a
      // row_number window that sorts every (window, user) row
      ev(s, d)
        .groupBy(
          date_format(date_trunc("hour", col("ts")), "yyyy-MM-dd HH:mm:ss").as("hour_start"),
          col("user_id"))
        .agg(count(lit(1)).as("n"))
        .groupBy("hour_start")
        .agg(graft.functions.TopKScoredAggregate
          .top_k_scored(col("user_id").cast(LongType), col("n").cast("double"), 2).as("top"))
        .select(col("hour_start"), posexplode(col("top")).as(Seq("i", "s")))
        .select(col("hour_start"), col("s.id").as("user_id"),
          col("s.score").cast(LongType).as("n"), (col("i") + 1).cast(LongType).as("rnk"))
        .orderBy("hour_start", "rnk")
    },

    // OHLC downsampling: per (user, hour) the first/last/min/max value —
    // the classic time-series compaction. open/close via min_by/max_by on
    // a PACKED BIGINT (µs-offset-within-hour, event_id) key: within an
    // hour-aligned group it induces the same (ts, id) order as the padded
    // string key, but keeps the aggregation in a codegen'd HashAggregate
    // (string keys force SortAggregate — a full sort of every event on
    // both exchange sides). The oracle's arg_min/arg_max packs the
    // identical key; ties are impossible (event_id is unique).
    QueryDef("ev7_ohlc_downsample",
      """WITH e AS (SELECT user_id,
        |    strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour_start, value,
        |    (epoch_us(ts) - epoch_us(date_trunc('hour', ts))) * 2147483648
        |      + event_id AS k
        |  FROM events)
        |SELECT CAST(user_id AS BIGINT) AS user_id, hour_start,
        |  arg_min(value, k) AS open, arg_max(value, k) AS close,
        |  MIN(value) AS low, MAX(value) AS high, CAST(COUNT(*) AS BIGINT) AS n
        |FROM e GROUP BY 1, 2 ORDER BY user_id, hour_start""".stripMargin) { (s, d) =>
      // the shared guarded key builder (out-of-range ids raise loudly)
      val k = graft.ops.TimeSeriesOps.ohlcKeyHourPacked(col("ts"), col("event_id"))
      ev(s, d)
        .groupBy(col("user_id").cast(LongType).as("user_id"),
          date_format(date_trunc("hour", col("ts")), "yyyy-MM-dd HH:mm:ss").as("hour_start"))
        .agg(min_by(col("value"), k).as("open"), max_by(col("value"), k).as("close"),
          min("value").as("low"), max("value").as("high"),
          count(lit(1)).as("n"))
        .orderBy("user_id", "hour_start")
    },

    // Ordered conversion funnel (view -> click -> purchase): each stage's
    // first-hit time must FOLLOW the previous stage's — the standard
    // product-analytics funnel, not three independent counts. Three
    // chained (filter -> per-user MIN -> equi-join) stages: every shuffle
    // is keyed on user_id so AQE reuses the partitioning, each stage's
    // scan is pre-filtered to ONE event type (pushed to parquet), and the
    // per-stage frames shrink monotonically. The final counts/averages
    // are single-row aggregates over exact BIGINT micros.
    QueryDef("ev8_funnel",
      """WITH e AS (SELECT user_id, event_type, epoch_us(ts) AS tus FROM events),
        |s1 AS (SELECT user_id, MIN(tus) AS t1 FROM e WHERE event_type = 'view' GROUP BY 1),
        |s2 AS (SELECT e.user_id, MIN(s1.t1) AS t1, MIN(e.tus) AS t2
        |       FROM e JOIN s1 ON e.user_id = s1.user_id
        |       WHERE e.event_type = 'click' AND e.tus > s1.t1 GROUP BY 1),
        |s3 AS (SELECT e.user_id, MIN(s2.t1) AS t1, MIN(e.tus) AS t3
        |       FROM e JOIN s2 ON e.user_id = s2.user_id
        |       WHERE e.event_type = 'purchase' AND e.tus > s2.t2 GROUP BY 1)
        |SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM s1) AS n_view,
        |       (SELECT CAST(COUNT(*) AS BIGINT) FROM s2) AS n_click,
        |       (SELECT CAST(COUNT(*) AS BIGINT) FROM s3) AS n_purchase,
        |       (SELECT CAST(SUM(t3 - t1) AS DOUBLE) / COUNT(*) FROM s3) AS avg_convert_us""".stripMargin) { (s, d) =>
      val e = ev(s, d).select(col("user_id"), col("event_type"), unix_micros(col("ts")).as("tus"))
      val s1 = e.filter(col("event_type") === "view")
        .groupBy("user_id").agg(min("tus").as("t1"))
      val s2 = e.filter(col("event_type") === "click")
        .join(s1, "user_id").where(col("tus") > col("t1"))
        .groupBy("user_id").agg(min("t1").as("t1"), min("tus").as("t2"))
      val s3 = e.filter(col("event_type") === "purchase")
        .join(s2, "user_id").where(col("tus") > col("t2"))
        .groupBy("user_id").agg(min("t1").as("t1"), min("tus").as("t3"))
      s1.agg(count(lit(1)).as("n_view"))
        .crossJoin(s2.agg(count(lit(1)).as("n_click")))
        .crossJoin(s3.agg(count(lit(1)).as("n_purchase"),
          (sum(col("t3") - col("t1")).cast(DoubleType) / count(lit(1))).as("avg_convert_us")))
    },

    // Cohort retention: users grouped by their first-activity day, the
    // classic triangle of "how many came back on day k". One distinct
    // (user, day) pass, one per-user MIN for the cohort day, one join
    // back on user_id, one (cohort, offset) count — all hash shuffles on
    // small keyspaces; COUNT(DISTINCT) runs as a two-phase partial
    // aggregate, never a per-group collection.
    QueryDef("ev9_retention",
      """WITH a AS (SELECT DISTINCT user_id, date_trunc('day', ts) AS day FROM events),
        |f AS (SELECT user_id, MIN(day) AS cohort FROM a GROUP BY 1)
        |SELECT strftime(f.cohort, '%Y-%m-%d') AS cohort_day,
        |  CAST(date_diff('day', f.cohort, a.day) AS BIGINT) AS day_offset,
        |  CAST(COUNT(DISTINCT a.user_id) AS BIGINT) AS n_users
        |FROM a JOIN f ON a.user_id = f.user_id
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin) { (s, d) =>
      val a = ev(s, d).select(col("user_id"), date_trunc("day", col("ts")).as("day")).distinct()
      val f = a.groupBy("user_id").agg(min("day").as("cohort"))
      a.join(f, "user_id")
        .groupBy(date_format(col("cohort"), "yyyy-MM-dd").as("cohort_day"),
          datediff(to_date(col("day")), to_date(col("cohort"))).cast(LongType).as("day_offset"))
        .agg(countDistinct("user_id").as("n_users"))
        .orderBy("cohort_day", "day_offset")
    },

    // Event-sequence transition matrix (first-order Markov counts): for
    // each user's time-ordered event stream, count prev->next type pairs
    // and the exact total gap. One window (LAG) sorted within user
    // partitions, then a tiny (5x5 keyspace) hash aggregate — at scale
    // the sort is per-user-partition and the aggregate is map-side
    // combinable down to ~25 rows.
    QueryDef("ev10_transitions",
      """WITH o AS (SELECT user_id, event_type, epoch_us(ts) AS tus, event_id FROM events),
        |l AS (SELECT event_type,
        |        LAG(event_type) OVER (PARTITION BY user_id ORDER BY tus, event_id) AS prev_type,
        |        tus - LAG(tus) OVER (PARTITION BY user_id ORDER BY tus, event_id) AS gap_us
        |      FROM o)
        |SELECT prev_type, event_type AS next_type, CAST(COUNT(*) AS BIGINT) AS n,
        |  CAST(SUM(gap_us) AS BIGINT) AS total_gap_us
        |FROM l WHERE prev_type IS NOT NULL
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin) { (s, d) =>
      val w = Window.partitionBy("user_id").orderBy("tus", "event_id")
      ev(s, d)
        .select(col("user_id"), col("event_type"), unix_micros(col("ts")).as("tus"), col("event_id"))
        .withColumn("prev_type", lag("event_type", 1).over(w))
        .withColumn("gap_us", col("tus") - lag("tus", 1).over(w))
        .where(col("prev_type").isNotNull)
        .groupBy(col("prev_type"), col("event_type").as("next_type"))
        .agg(count(lit(1)).as("n"), sum("gap_us").cast(LongType).as("total_gap_us"))
        .orderBy("prev_type", "next_type")
    },

    // Time-weighted average (TWAP): each observation weighted by how long
    // it was "current" — the duration to the next event in the same
    // (user, day). All arithmetic exact until the final division: values
    // quantize to integer micro-units (floor(v*1e6+0.5) — identical IEEE
    // ops in both engines), gaps to whole seconds (integer division), and
    // the weighted sum accumulates in DECIMAL(38,0). One keyed window +
    // one hash aggregate, both partitioned on user_id.
    QueryDef("ev11_twap",
      """WITH o AS (SELECT user_id, date_trunc('day', ts) AS day, epoch_us(ts) AS tus,
        |        CAST(FLOOR(value * 1000000.0 + 0.5) AS BIGINT) AS vmicro, event_id
        |      FROM events),
        |l AS (SELECT user_id, day, vmicro,
        |        (LEAD(tus) OVER (PARTITION BY user_id, day ORDER BY tus, event_id) - tus)
        |          // 1000000 AS gap_s
        |      FROM o),
        |g AS (SELECT user_id, strftime(day, '%Y-%m-%d') AS day,
        |        SUM(CAST(vmicro * gap_s AS DECIMAL(38,0))) AS sp,
        |        CAST(SUM(gap_s) AS BIGINT) AS total_s,
        |        CAST(COUNT(*) AS BIGINT) AS n_gaps
        |      FROM l WHERE gap_s IS NOT NULL GROUP BY 1, 2)
        |SELECT user_id, day,
        |  CAST(sp AS DOUBLE) / CAST(total_s AS DOUBLE) / 1000000.0 AS twap,
        |  total_s, n_gaps
        |FROM g WHERE total_s > 0 ORDER BY user_id, day""".stripMargin) { (s, d) =>
      val w = Window.partitionBy("user_id", "day").orderBy("tus", "event_id")
      ev(s, d)
        .select(col("user_id"), date_trunc("day", col("ts")).as("day"),
          unix_micros(col("ts")).as("tus"),
          floor(col("value") * lit(1000000.0) + 0.5).cast(LongType).as("vmicro"),
          col("event_id"))
        .withColumn("next_tus", lead("tus", 1).over(w))
        .withColumn("gap_s", expr("(next_tus - tus) div 1000000"))
        .where(col("gap_s").isNotNull)
        .groupBy(col("user_id"), date_format(col("day"), "yyyy-MM-dd").as("day"))
        .agg(sum((col("vmicro") * col("gap_s")).cast(DecimalType(38, 0))).as("sp"),
          sum("gap_s").cast(LongType).as("total_s"),
          count(lit(1)).as("n_gaps"))
        .where(col("total_s") > 0)
        .select(col("user_id"), col("day"),
          (col("sp").cast(DoubleType) / col("total_s").cast(DoubleType) / lit(1000000.0)).as("twap"),
          col("total_s"), col("n_gaps"))
        .orderBy("user_id", "day")
    },

    // Interval join WITHOUT an equi key — "how many purchases landed in
    // the 10 minutes after each error". The naive plan is an O(n·m)
    // nested-loop range join; the Spark side runs the binned rewrite
    // (ops.TimeSeriesOps.binnedIntervalJoin): intervals explode to the
    // ≤2 bins they overlap, points hash to their single bin, and the
    // pairing is a plain shuffled equi-join on the bin id + exact
    // residual bounds. DuckDB's oracle runs its native IEJoin on the
    // same predicate — two different physical strategies, identical
    // pairs.
    QueryDef("ev12_interval_join",
      """WITH er AS (SELECT event_id, epoch_us(ts) AS tus FROM events WHERE event_type = 'error'),
        |pu AS (SELECT epoch_us(ts) AS pts FROM events WHERE event_type = 'purchase')
        |SELECT er.event_id, CAST(COUNT(pu.pts) AS BIGINT) AS n_purchases
        |FROM er LEFT JOIN pu ON pu.pts >= er.tus AND pu.pts < er.tus + 600000000
        |GROUP BY er.event_id ORDER BY er.event_id""".stripMargin) { (s, d) =>
      val e = ev(s, d)
      val errors = e.where(col("event_type") === "error")
        .select(col("event_id"), unix_micros(col("ts")).as("tus"))
        .withColumn("end_us", col("tus") + lit(600000000L))
      val purchases = e.where(col("event_type") === "purchase")
        .select(unix_micros(col("ts")).as("pts"))
      val pairs = graft.ops.TimeSeriesOps.binnedIntervalJoin(
        errors, purchases, "tus", "end_us", "pts", binWidthUs = 600000000L)
      errors.select("event_id")
        .join(pairs.groupBy("event_id").agg(count(lit(1)).as("n")), Seq("event_id"), "left")
        .select(col("event_id"), coalesce(col("n"), lit(0L)).as("n_purchases"))
        .orderBy("event_id")
    },

    // Rolling z-score anomaly flags: |x − mean| > 3σ over each user's
    // trailing 24 observations, evaluated entirely in exact Int64 on
    // milli-unit values — the flag compares (n·x − m)² with 9·(n·s2 − m²)
    // (both sides integer), so there's no float variance to drift between
    // engines or partitionings. One keyed window shuffle, zero joins.
    QueryDef("ev13_anomaly",
      """WITH o AS (SELECT user_id, event_id, epoch_us(ts) AS tus,
        |        CAST(FLOOR(value * 1000.0 + 0.5) AS BIGINT) AS vm FROM events),
        |w AS (SELECT user_id, event_id, vm,
        |        SUM(vm) OVER win AS m, SUM(vm*vm) OVER win AS s2,
        |        COUNT(*) OVER win AS n
        |      FROM o WINDOW win AS (PARTITION BY user_id ORDER BY tus, event_id
        |        ROWS BETWEEN 23 PRECEDING AND CURRENT ROW))
        |SELECT user_id, event_id, vm
        |FROM w WHERE n = 24 AND (24*vm - m)*(24*vm - m) > 9*(24*s2 - m*m)
        |ORDER BY user_id, event_id""".stripMargin) { (s, d) =>
      val win = Window.partitionBy("user_id").orderBy("tus", "event_id")
        .rowsBetween(-23, Window.currentRow)
      ev(s, d)
        .select(col("user_id"), col("event_id"), unix_micros(col("ts")).as("tus"),
          floor(col("value") * lit(1000.0) + lit(0.5)).cast(LongType).as("vm"))
        // pre-project vm² so all three aggregates land in ONE Window node
        // (chained withColumns would stack a second Window pass)
        .withColumn("vm2", col("vm") * col("vm"))
        .select(col("user_id"), col("event_id"), col("tus"), col("vm"),
          sum("vm").over(win).as("m"),
          sum("vm2").over(win).as("s2"),
          count(lit(1)).over(win).as("n"))
        .where(col("n") === 24 &&
          (lit(24L) * col("vm") - col("m")) * (lit(24L) * col("vm") - col("m")) >
            lit(9L) * (lit(24L) * col("s2") - col("m") * col("m")))
        .select("user_id", "event_id", "vm")
        .orderBy("user_id", "event_id")
    },

    // Rolling 7-day distinct active users per (day, event_type) — the
    // DAU/WAU retention primitive. The oracle states it naturally as a
    // BETWEEN range join (each anchor day scans its trailing window);
    // the Spark side inverts it into a BOUNDED ×7 fan-out: dedup to
    // (type, user, day) first (map-side combine kills the event volume),
    // explode each active day to the ≤7 anchors it can serve, keep
    // anchors that are observed days (broadcast spine), count distinct.
    // At 100 TB the range join is O(days × events) with a skewed probe;
    // the fan-out is linear in ACTIVE-user-days with a constant 7.
    QueryDef("ev14_rolling_distinct",
      """WITH ud AS (SELECT DISTINCT event_type, user_id, date_trunc('day', ts) AS day
        |            FROM events),
        |days AS (SELECT DISTINCT date_trunc('day', ts) AS day FROM events)
        |SELECT strftime(d.day, '%Y-%m-%d') AS day, u.event_type,
        |  CAST(COUNT(DISTINCT u.user_id) AS BIGINT) AS users_7d
        |FROM days d JOIN ud u ON u.day BETWEEN d.day - INTERVAL 6 DAY AND d.day
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin) { (s, d) =>
      val e = ev(s, d)
      // Dedup IN-ROW, not in the aggregate: collect each (type, user)'s
      // distinct days (bounded by the window's day span), expand to the
      // 7-day anchor set per row with array_distinct, and count with a
      // PLAIN map-side-combined aggregate — each (type, user, anchor)
      // is unique by construction, so no COUNT DISTINCT Expand and no
      // 7×-exploded full shuffle (that plan moved every exploded row
      // into a dedup aggregate: 4.7 s at sf1 vs ~2 s for this shape).
      val byUser = e.select(col("event_type"), col("user_id"),
          date_trunc("day", col("ts")).as("day"))
        .groupBy("event_type", "user_id")
        .agg(collect_set("day").as("days"))
      val spine = e.select(date_trunc("day", col("ts")).as("anchor")).distinct()
      byUser.select(col("event_type"),
          explode(expr("array_distinct(flatten(transform(days, " +
            "d -> sequence(d, d + interval 6 days, interval 1 day))))")).as("anchor"))
        .join(broadcast(spine), "anchor")
        .groupBy(col("anchor"), col("event_type"))
        .agg(count(lit(1)).as("users_7d"))
        .select(date_format(col("anchor"), "yyyy-MM-dd").as("day"),
          col("event_type"), col("users_7d"))
        .orderBy("day", "event_type")
    },

    // Exponentially-weighted moving average (α = 1/2) over each user's
    // last 8 observations — the smoothing primitive behind monitoring
    // baselines and trend features. Weights are POWERS OF TWO on
    // milli-unit integer values, so the weighted sum is exact Int64 and
    // the single float-free `div` normalization is engine-portable
    // (missing leading observations just drop their weight from the
    // denominator — self-normalizing truncation at series start). One
    // window shuffle keyed on user_id; the 8 LAGs share one frame pass.
    QueryDef("ev15_ewma", {
      def lagTerm(j: Int): String =
        if (j == 0) s"xm * ${1 << (EwmaN - 1)}"
        else s"COALESCE(LAG(xm, $j) OVER w * ${1 << (EwmaN - 1 - j)}, 0)"
      def denTerm(j: Int): String =
        if (j == 0) s"${1 << (EwmaN - 1)}"
        else s"CASE WHEN LAG(xm, $j) OVER w IS NOT NULL THEN ${1 << (EwmaN - 1 - j)} ELSE 0 END"
      s"""WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS tus,
         |             CAST(ROUND(value * 1000) AS BIGINT) AS xm
         |           FROM events),
         |w AS (SELECT user_id, event_id,
         |        ${(0 until EwmaN).map(lagTerm).mkString(" + ")} AS num,
         |        ${(0 until EwmaN).map(denTerm).mkString(" + ")} AS den
         |      FROM e WINDOW w AS (PARTITION BY user_id ORDER BY tus, event_id))
         |SELECT user_id, event_id, CAST(num // den AS BIGINT) AS ewma_milli
         |FROM w ORDER BY user_id, event_id""".stripMargin
    }) { (s, d) =>
      val w = Window.partitionBy("user_id").orderBy("tus", "event_id")
      val e = ev(s, d).select(col("user_id"), col("event_id"),
        unix_micros(col("ts")).as("tus"),
        floor(col("value") * 1000 + 0.5).cast(LongType).as("xm"))
      val num = (0 until EwmaN).map { j =>
        if (j == 0) col("xm") * lit(1L << (EwmaN - 1))
        else coalesce(lag(col("xm"), j).over(w) * lit(1L << (EwmaN - 1 - j)), lit(0L))
      }.reduce(_ + _)
      val den = (0 until EwmaN).map { j =>
        if (j == 0) lit(1L << (EwmaN - 1))
        else when(lag(col("xm"), j).over(w).isNotNull, lit(1L << (EwmaN - 1 - j))).otherwise(lit(0L))
      }.reduce(_ + _)
      e.select(col("user_id"), col("event_id"), num.as("num"), den.as("den"))
        .select(col("user_id"), col("event_id"),
          expr("num div den").as("ewma_milli"))
        .orderBy("user_id", "event_id")
    },

    // Session path mining — the top-20 most common event-type sequences
    // (ev2's 30-minute sessions, truncated to each session's first 5
    // events so path strings stay BOUNDED — the cap is what keeps the
    // path cardinality, shuffle width and per-row state independent of
    // session length at 100 TB). Ordering inside a session is the total
    // (tus, event_id) order, so paths are deterministic; the path count
    // aggregate map-side combines and the final top-20 is one
    // TakeOrdered. The funnel/UX-flow primitive (ev8's fixed funnel
    // without pre-declaring the stages).
    QueryDef("ev16_path_topk",
      """WITH e AS (SELECT user_id, event_id, event_type, epoch_us(ts) AS tus FROM events),
        |l AS (SELECT *, LAG(tus) OVER (PARTITION BY user_id ORDER BY tus, event_id) AS prev FROM e),
        |f AS (SELECT *, CASE WHEN prev IS NULL OR tus - prev > 1800000000 THEN 1 ELSE 0 END AS brk FROM l),
        |s AS (SELECT *, SUM(brk) OVER (PARTITION BY user_id ORDER BY tus, event_id
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id FROM f),
        |r AS (SELECT user_id, session_id, event_type,
        |        ROW_NUMBER() OVER (PARTITION BY user_id, session_id ORDER BY tus, event_id) AS rn
        |      FROM s),
        |p AS (SELECT user_id, session_id, string_agg(event_type, '>' ORDER BY rn) AS path
        |      FROM r WHERE rn <= 5 GROUP BY 1, 2)
        |SELECT path, CAST(COUNT(*) AS BIGINT) AS n_sessions
        |FROM p GROUP BY 1 ORDER BY n_sessions DESC, path LIMIT 20""".stripMargin) { (s, d) =>
      val w = Window.partitionBy("user_id").orderBy("tus", "event_id")
      val sess = ev(s, d)
        .select(col("user_id"), col("event_id"), col("event_type"),
          unix_micros(col("ts")).as("tus"))
        .withColumn("prev", lag("tus", 1).over(w))
        .withColumn("brk",
          when(col("prev").isNull || col("tus") - col("prev") > 1800000000L, 1).otherwise(0))
        .withColumn("session_id",
          sum("brk").over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)).cast(LongType))
        .withColumn("rn", row_number().over(
          Window.partitionBy("user_id", "session_id").orderBy("tus", "event_id")))
        .where(col("rn") <= 5)
      sess.groupBy("user_id", "session_id")
        .agg(expr("concat_ws('>', transform(array_sort(collect_list(struct(rn, event_type))), x -> x.event_type))")
          .as("path"))
        .groupBy("path").agg(count(lit(1)).as("n_sessions"))
        .orderBy(col("n_sessions").desc, col("path"))
        .limit(20)
    },

    // CUSUM change-point detection (Page 1954): flag the rows where a
    // user's cumulative drift above a target level clears threshold h —
    // the upward-shift detector monitoring pipelines run on metric
    // streams. The clamped recursion S_i = max(0, S_{i-1} + (x_i − t))
    // is not window-expressible directly, but its closed form is:
    // S_i = P_i − min_{j≤i} P_j with P the running sum of (x − t) — two
    // chained running windows over the SAME (user, time) sort, one
    // shuffle total, all arithmetic exact Int64 on milli-units.
    QueryDef("ev17_cusum",
      s"""WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS tus,
         |             CAST(ROUND(value * 1000) AS BIGINT) AS xm FROM events),
         |p AS (SELECT *, SUM(xm - $CusumTarget) OVER (PARTITION BY user_id ORDER BY tus, event_id
         |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pp FROM e),
         |s AS (SELECT *, pp - MIN(pp) OVER (PARTITION BY user_id ORDER BY tus, event_id
         |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cusum FROM p)
         |SELECT user_id, event_id, CAST(cusum AS BIGINT) AS cusum
         |FROM s WHERE cusum >= $CusumH
         |ORDER BY user_id, event_id""".stripMargin) { (s, d) =>
      val w = Window.partitionBy("user_id").orderBy("tus", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      ev(s, d)
        .select(col("user_id"), col("event_id"), unix_micros(col("ts")).as("tus"),
          floor(col("value") * 1000 + 0.5).cast(LongType).as("xm"))
        .withColumn("pp", sum(col("xm") - lit(CusumTarget)).over(w))
        .withColumn("cusum", col("pp") - min("pp").over(w))
        .where(col("cusum") >= CusumH)
        .select(col("user_id"), col("event_id"), col("cusum"))
        .orderBy("user_id", "event_id")
    },

    // SCD2 interval table (slowly-changing dimension, Type 2): each
    // user's viewed-item history as validity intervals — valid_from =
    // the change, valid_to = the next change (null while current),
    // consecutive repeats collapsed. The observation log dedups to one
    // row per (user, µs) via max_by so the SCD2 ts key is unique (the
    // ops.Scd2 contract); the INCREMENTAL maintenance path
    // (Scd2.applyChanges: rebuild touched keys only, untouched rows
    // pass through) is asserted bit-equal to this from-scratch build in
    // OpsSpec. One user-keyed window sort.
    QueryDef("ev18_scd2_intervals",
      """WITH e AS (SELECT user_id, epoch_us(ts) AS tus, event_id,
        |             CAST(props->>'k' AS BIGINT) AS item
        |           FROM events WHERE event_type = 'view'),
        |obs AS (SELECT user_id, tus, max_by(item, event_id) AS item
        |        FROM e GROUP BY 1, 2),
        |l AS (SELECT *, LAG(item) OVER (PARTITION BY user_id ORDER BY tus) AS prev FROM obs),
        |cp AS (SELECT user_id, tus, item FROM l WHERE prev IS NULL OR prev <> item),
        |iv AS (SELECT user_id, item, tus AS valid_from_us,
        |         LEAD(tus) OVER (PARTITION BY user_id ORDER BY tus) AS valid_to_us
        |       FROM cp)
        |SELECT user_id, item, valid_from_us, valid_to_us,
        |  valid_to_us IS NULL AS is_current
        |FROM iv ORDER BY user_id, valid_from_us""".stripMargin) { (s, d) =>
      val log = ev(s, d).filter(col("event_type") === "view")
        .select(col("user_id"), unix_micros(col("ts")).as("tus"), col("event_id"),
          graft.ops.EventProps.propsK(col("props")).as("item"))
        .groupBy("user_id", "tus")
        .agg(max_by(col("item"), col("event_id")).as("item"))
      graft.ops.Scd2.fromHistory(log, Seq("user_id"), "tus", Seq("item"))
        .select(col("user_id"), col("item"),
          col("valid_from").as("valid_from_us"), col("valid_to").as("valid_to_us"),
          col("is_current"))
        .orderBy("user_id", "valid_from_us")
    },

    // Rolling least-squares slope — per-user trend over the last 8
    // observations, the drift detector CUSUM (ev17) doesn't give a
    // MAGNITUDE for. x = the observation index (row_number), so the
    // regression moments Σx, Σy, Σxy, Σx² are exact-Int64 window sums
    // over ONE shared frame; slope = (nΣxy − ΣxΣy)/(nΣxx − (Σx)²) is a
    // single correctly-rounded double division on integer operands —
    // bit-equal on both engines. Emitted only for full frames.
    QueryDef("ev19_rolling_slope",
      """WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS tus,
        |             CAST(ROUND(value * 1000) AS BIGINT) AS y FROM events),
        |xr AS (SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY user_id
        |         ORDER BY tus, event_id) AS BIGINT) AS x FROM e),
        |r AS (SELECT *, SUM(x) OVER w8 AS sx, SUM(y) OVER w8 AS sy,
        |        SUM(x * y) OVER w8 AS sxy, SUM(x * x) OVER w8 AS sxx
        |      FROM xr
        |      WINDOW w8 AS (PARTITION BY user_id ORDER BY tus, event_id
        |               ROWS BETWEEN 7 PRECEDING AND CURRENT ROW))
        |SELECT user_id, event_id,
        |  CAST(8 * sxy - sx * sy AS DOUBLE) / (8 * sxx - sx * sx) AS slope_milli
        |FROM r WHERE x >= 8 ORDER BY user_id, event_id""".stripMargin) { (s, d) =>
      val w = Window.partitionBy("user_id").orderBy("tus", "event_id")
      val w8 = w.rowsBetween(-7, Window.currentRow)
      ev(s, d)
        .select(col("user_id"), col("event_id"), unix_micros(col("ts")).as("tus"),
          floor(col("value") * 1000 + 0.5).cast(LongType).as("y"))
        .withColumn("x", row_number().over(w).cast(LongType))
        .withColumn("sx", sum("x").over(w8))
        .withColumn("sy", sum("y").over(w8))
        .withColumn("sxy", sum(col("x") * col("y")).over(w8))
        .withColumn("sxx", sum(col("x") * col("x")).over(w8))
        .where(col("x") >= 8)
        .select(col("user_id"), col("event_id"),
          ((lit(8) * col("sxy") - col("sx") * col("sy")).cast(DoubleType) /
            (lit(8) * col("sxx") - col("sx") * col("sx"))).as("slope_milli"))
        .orderBy("user_id", "event_id")
    },

    // Two-sample z-test per day — the experimentation primitive: does
    // the 'purchase' value mean differ from the 'view' mean beyond
    // 2 standard errors? The naive z = Δ/se is float soup; here the
    // inequality Δ² > 4·se² is cleared of every division:
    //   (S₁n₂ − S₂n₁)²·n₁n₂ > 4·[(n₁Q₁ − S₁²)·n₂³ + (n₂Q₂ − S₂²)·n₁³]
    // and evaluated in EXACT wide-integer arithmetic (DECIMAL(38,0) on
    // Spark, HUGEINT in DuckDB — products stay ~1e24, far below either
    // limit), so the significance flag is bit-portable. The reported
    // mean diff is the single correctly-rounded double division.
    QueryDef("ev20_ab_significance",
      """WITH m AS (SELECT date_trunc('day', ts) AS day, event_type,
        |             CAST(COUNT(*) AS HUGEINT) AS n,
        |             CAST(SUM(CAST(ROUND(value * 1000) AS BIGINT)) AS HUGEINT) AS s,
        |             CAST(SUM(CAST(ROUND(value * 1000) AS BIGINT)
        |                      * CAST(ROUND(value * 1000) AS BIGINT)) AS HUGEINT) AS q
        |           FROM events WHERE event_type IN ('view', 'purchase')
        |           GROUP BY 1, 2),
        |p AS (SELECT a.day, a.n AS n1, a.s AS s1, a.q AS q1,
        |        b.n AS n2, b.s AS s2, b.q AS q2
        |      FROM m a JOIN m b ON a.day = b.day
        |        AND a.event_type = 'view' AND b.event_type = 'purchase')
        |SELECT strftime(day, '%Y-%m-%d') AS day,
        |  CAST(n1 AS BIGINT) AS n_view, CAST(n2 AS BIGINT) AS n_purchase,
        |  CAST(s1 * n2 - s2 * n1 AS DOUBLE) / CAST(n1 * n2 AS DOUBLE) AS mean_diff_milli,
        |  (s1 * n2 - s2 * n1) * (s1 * n2 - s2 * n1) * n1 * n2 >
        |    4 * ((n1 * q1 - s1 * s1) * n2 * n2 * n2 + (n2 * q2 - s2 * s2) * n1 * n1 * n1)
        |    AS significant
        |FROM p ORDER BY 1""".stripMargin) { (s, d) =>
      val d38 = DecimalType(38, 0)
      val vm = floor(col("value") * 1000 + 0.5).cast(LongType)
      val m = ev(s, d).filter(col("event_type").isin("view", "purchase"))
        .groupBy(date_trunc("day", col("ts")).as("day"), col("event_type"))
        .agg(count(lit(1)).cast(d38).as("n"),
          sum(vm).cast(d38).as("s"),
          sum(vm * vm).cast(d38).as("q"))
      val a = m.filter(col("event_type") === "view")
        .select(col("day"), col("n").as("n1"), col("s").as("s1"), col("q").as("q1"))
      val b = m.filter(col("event_type") === "purchase")
        .select(col("day").as("day2"), col("n").as("n2"), col("s").as("s2"), col("q").as("q2"))
      val dn = col("s1") * col("n2") - col("s2") * col("n1")
      abJoin(a, b, dn)
    },

    // Trending items — view counts under exponential TIME DECAY (half
    // life = 1 day) over a BOUNDED 45-day lookback: each view is worth
    // 2^(its_day − window_start), so the scaled score is an EXACT Int64
    // sum of power-of-two day weights whose exponent is capped at 44 BY
    // CONSTRUCTION — Int64-safe at any history length (decay beyond 45
    // half-lives is zero anyway), and recent activity dominates. The
    // freshness-weighted ranking feeds/recommenders run; one
    // (item, day) aggregate + one item aggregate, TakeOrdered top-10.
    QueryDef("ev21_trending",
      """WITH v AS (SELECT CAST(props->>'k' AS BIGINT) AS item,
        |             date_diff('day', TIMESTAMP '1995-01-01 00:00:00', date_trunc('day', ts)) AS d
        |           FROM events WHERE event_type = 'view'),
        |base AS (SELECT CAST(MAX(d) - 44 AS BIGINT) AS d0 FROM v),
        |pd AS (SELECT item, d, CAST(COUNT(*) AS BIGINT) AS c FROM v GROUP BY 1, 2)
        |SELECT item, CAST(SUM(c * (1::BIGINT << CAST(d - d0 AS INTEGER))) AS BIGINT) AS score_scaled,
        |  CAST(SUM(c) AS BIGINT) AS n_views
        |FROM pd, base WHERE d >= d0 GROUP BY item
        |ORDER BY score_scaled DESC, item LIMIT 10""".stripMargin) { (s, d) =>
      val v = ev(s, d).filter(col("event_type") === "view")
        .select(graft.ops.EventProps.propsK(col("props")).as("item"),
          datediff(date_trunc("day", col("ts")),
            to_timestamp(lit("1995-01-01 00:00:00"))).cast(LongType).as("d"))
      val base = v.agg((max("d") - 44).as("d0"))
      val pd = v.groupBy("item", "d").agg(count(lit(1)).as("c"))
      pd.crossJoin(broadcast(base))
        .where(col("d") >= col("d0"))
        .groupBy("item")
        .agg(sum(col("c") * expr("shiftleft(1L, CAST(d - d0 AS INT))")).as("score_scaled"),
          sum("c").as("n_views"))
        .orderBy(col("score_scaled").desc, col("item"))
        .limit(10)
    },

    // REVENUE CONCENTRATION — the exact Gini coefficient of per-user
    // purchase revenue (how top-heavy is the business): the rank formula
    // G = 2·Σ(i·xᵢ)/(n·Σx) − (n+1)/n over ascending-sorted users, with
    // Σ(i·xᵢ) an exact DECIMAL(38,0)/HUGEINT sum (rank×milli products
    // overflow Int64) and the two divisions in identical double. Ranks
    // are a one-pass global row_number over the per-USER aggregate (the
    // user-bounded relation, not events); at extreme user counts the
    // sketch-quantile Lorenz approximation replaces exactness.
    QueryDef("ev35_revenue_gini",
      """WITH u AS (SELECT user_id, CAST(SUM(CAST(ROUND(value * 1000) AS BIGINT)) AS BIGINT) AS vm
        |           FROM events WHERE event_type = 'purchase' GROUP BY 1),
        |r AS (SELECT vm, CAST(ROW_NUMBER() OVER (ORDER BY vm, user_id) AS BIGINT) AS i FROM u),
        |a AS (SELECT CAST(COUNT(*) AS HUGEINT) AS n,
        |        SUM(CAST(vm AS HUGEINT)) AS sx,
        |        SUM(CAST(i AS HUGEINT) * vm) AS six
        |      FROM r)
        |SELECT CAST(n AS BIGINT) AS n_users, CAST(sx AS BIGINT) AS total_milli,
        |  CAST(2 * six AS DOUBLE) / CAST(n * sx AS DOUBLE)
        |    - CAST(n + 1 AS DOUBLE) / CAST(n AS DOUBLE) AS gini
        |FROM a""".stripMargin) { (s, d) =>
      val d38 = DecimalType(38, 0)
      val u = ev(s, d).filter(col("event_type") === "purchase")
        .groupBy("user_id")
        .agg(sum(floor(col("value") * 1000 + 0.5).cast(LongType)).cast(LongType).as("vm"))
      // global row_number via DistributedRank (rank-offset composition at
      // scale — users are unbounded, a single-task global sort is not)
      val r = graft.ops.DistributedRank.rowNumberByKey(
        u, Seq(), Seq(("vm", true), ("user_id", true)), out = "i")
      r.agg(count(lit(1)).cast(d38).as("n"), sum(col("vm").cast(d38)).as("sx"),
          sum(col("i").cast(d38) * col("vm")).as("six"))
        .select(col("n").cast(LongType).as("n_users"),
          col("sx").cast(LongType).as("total_milli"),
          ((lit(2) * col("six")).cast(DoubleType) / (col("n") * col("sx")).cast(DoubleType) -
            (col("n") + lit(1)).cast(DoubleType) / col("n").cast(DoubleType)).as("gini"))
    },

    // RFM SEGMENTATION — recency / frequency / monetary quintile scores
    // per purchasing user, the classic CRM cut: each dimension ntile(5)
    // over a DETERMINISTIC total order (metric, then user_id — ties
    // can't float between engines), segments aggregated to counts +
    // monetary totals. Three window passes over the per-user aggregate
    // (users, not events) + one tiny segment rollup.
    QueryDef("ev34_rfm_segments",
      """WITH p AS (SELECT user_id, epoch_us(ts) AS tus,
        |             CAST(ROUND(value * 1000) AS BIGINT) AS vm
        |           FROM events WHERE event_type = 'purchase'),
        |mx AS (SELECT MAX(tus) AS mt FROM p),
        |u AS (SELECT user_id,
        |        CAST((mx.mt - MAX(tus)) // 86400000000 AS BIGINT) AS rec_days,
        |        CAST(COUNT(*) AS BIGINT) AS freq,
        |        CAST(SUM(vm) AS BIGINT) AS mon
        |      FROM p, mx GROUP BY user_id, mx.mt),
        |sc AS (SELECT user_id, mon,
        |         NTILE(5) OVER (ORDER BY rec_days DESC, user_id) AS r,
        |         NTILE(5) OVER (ORDER BY freq, user_id) AS f,
        |         NTILE(5) OVER (ORDER BY mon, user_id) AS m
        |       FROM u)
        |SELECT CAST(r AS BIGINT) AS r, CAST(f AS BIGINT) AS f, CAST(m AS BIGINT) AS m,
        |  CAST(COUNT(*) AS BIGINT) AS n_users, CAST(SUM(mon) AS BIGINT) AS mon_milli
        |FROM sc GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin) { (s, d) =>
      val p = ev(s, d).filter(col("event_type") === "purchase")
        .select(col("user_id"), unix_micros(col("ts")).as("tus"),
          floor(col("value") * 1000 + 0.5).cast(LongType).as("vm"))
      // the per-user aggregate is checkpointed ONCE (bounded by |users|,
      // the standard materialization a three-way rank fans out from) so
      // the three quintile passes don't each re-aggregate events — and
      // they hang INDEPENDENTLY off it (chaining them multiplied the
      // upstream lineage through each stage's rank/count/sample sides)
      val u = p.crossJoin(broadcast(p.agg(max("tus").as("mt"))))
        .groupBy("user_id", "mt")
        .agg(max("tus").as("lt"), count(lit(1)).as("freq"), sum("vm").as("mon"))
        .select(col("user_id"),
          expr("(mt - lt) div 86400000000L").as("rec_days"), col("freq"), col("mon"))
        .localCheckpoint(false)
      // each quintile via the distributed ntile (q46's DistributedRank:
      // textbook window when the per-user frame is small, rank-offset
      // composition at scale — identical assignment either way); DESC
      // recency expressed as an ascending negated column
      import graft.ops.DistributedRank.ntileByKey
      val rb = ntileByKey(u.withColumn("rneg", -col("rec_days")),
          Seq(), Seq("rneg", "user_id"), 5)
        .select(col("user_id"), col("bin").as("r"))
      val fb = ntileByKey(u, Seq(), Seq("freq", "user_id"), 5)
        .select(col("user_id"), col("bin").as("f"))
      val mb = ntileByKey(u, Seq(), Seq("mon", "user_id"), 5)
        .select(col("user_id"), col("mon"), col("bin").as("m"))
      rb.join(fb, "user_id").join(mb, "user_id")
        .groupBy(col("r").cast(LongType).as("r"), col("f").cast(LongType).as("f"),
          col("m").cast(LongType).as("m"))
        .agg(count(lit(1)).as("n_users"), sum("mon").as("mon_milli"))
        .orderBy("r", "f", "m")
    },

    // DAU / MAU stickiness — the engagement ratio every product review
    // opens with: daily actives over trailing-30-day actives, exact.
    // The rolling DISTINCT is computed by CONTRIBUTION EXPLODE — each
    // (user, active day) row feeds the 30 windows it belongs to, then
    // one distinct + count per day (bounded 30× inflation, shuffles
    // keyed by day — never a per-day re-scan; at 100 TB the sketch
    // rollup (q38 HLL / q42 KMV) replaces exactness, same plan shape).
    QueryDef("ev33_dau_mau",
      """WITH a AS (SELECT DISTINCT user_id, epoch_us(ts) // 86400000000 AS d FROM events),
        |dau AS (SELECT d, CAST(COUNT(*) AS BIGINT) AS dau FROM a GROUP BY 1),
        |contrib AS (SELECT DISTINCT a.user_id, a.d + x AS d
        |            FROM a, UNNEST(range(0, 30)) t(x)),
        |mau AS (SELECT d, CAST(COUNT(*) AS BIGINT) AS mau FROM contrib GROUP BY 1)
        |SELECT dau.d AS epoch_day, dau.dau, mau.mau,
        |  CAST(1000000 * dau.dau // mau.mau AS BIGINT) AS stickiness_ppm
        |FROM dau JOIN mau ON mau.d = dau.d ORDER BY 1""".stripMargin) { (s, d) =>
      val a = ev(s, d)
        .select(col("user_id"), expr("unix_micros(ts) div 86400000000L").as("d"))
        .distinct()
      val dau = a.groupBy("d").agg(count(lit(1)).as("dau"))
      val mau = a.withColumn("x", explode(sequence(lit(0), lit(29))))
        .select(col("user_id"), (col("d") + col("x")).as("d"))
        .distinct()
        .groupBy("d").agg(count(lit(1)).as("mau"))
      dau.join(mau, "d")
        .select(col("d").as("epoch_day"), col("dau"), col("mau"),
          expr("1000000L * dau div mau").as("stickiness_ppm"))
        .orderBy("epoch_day")
    },

    // ASSOCIATION RULES over co-views — support / confidence / lift for
    // item pairs, the market-basket trio gr6's cosine doesn't give:
    // lift_ppm = 1e6·n_ab·U // (n_a·n_b) (exact cross-multiplied
    // integers — >1e6 means the pair co-occurs MORE than independent),
    // conf a→b = 1e6·n_ab // n_a. Same capped bipartite projection as
    // gr6 (per-user basket truncated at 20 items, the skew bound); one
    // distinct pass, one pair join, broadcast degree joins.
    QueryDef("ev32_association_lift",
      """WITH it AS (SELECT DISTINCT user_id, CAST(props->>'k' AS BIGINT) AS item
        |            FROM events WHERE event_type = 'view'),
        |r AS (SELECT user_id, item,
        |        ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY item) AS rn FROM it),
        |b AS (SELECT user_id, item FROM r WHERE rn <= 20),
        |u AS (SELECT CAST(COUNT(DISTINCT user_id) AS BIGINT) AS nu FROM b),
        |deg AS (SELECT item, CAST(COUNT(*) AS BIGINT) AS n FROM b GROUP BY 1),
        |pairs AS (SELECT a.item AS i1, b2.item AS i2, CAST(COUNT(*) AS BIGINT) AS n_ab
        |          FROM b a JOIN b b2 ON a.user_id = b2.user_id AND a.item < b2.item
        |          GROUP BY 1, 2)
        |SELECT i1, i2, n_ab,
        |  CAST(1000000 * n_ab // da.n AS BIGINT) AS conf_ppm,
        |  CAST(1000000 * n_ab * u.nu // (da.n * db.n) AS BIGINT) AS lift_ppm
        |FROM pairs JOIN deg da ON da.item = i1 JOIN deg db ON db.item = i2, u
        |WHERE n_ab >= 3
        |ORDER BY lift_ppm DESC, i1, i2 LIMIT 50""".stripMargin) { (s, d) =>
      val it = ev(s, d).filter(col("event_type") === "view")
        .select(col("user_id"),
          graft.ops.EventProps.propsK(col("props")).as("item"))
        .distinct()
      val b = it.withColumn("rn", row_number().over(
          Window.partitionBy("user_id").orderBy("item")))
        .where(col("rn") <= 20)
        .select("user_id", "item")
        .localCheckpoint(false)
      val nu = b.agg(countDistinct("user_id").as("nu"))
      val deg = b.groupBy("item").agg(count(lit(1)).as("n"))
      val pairs = b.as("a").join(b.as("b2"),
          col("a.user_id") === col("b2.user_id") && col("a.item") < col("b2.item"))
        .groupBy(col("a.item").as("i1"), col("b2.item").as("i2"))
        .agg(count(lit(1)).as("n_ab"))
        .where(col("n_ab") >= 3)
      pairs
        .join(broadcast(deg.select(col("item").as("i1"), col("n").as("na"))), "i1")
        .join(broadcast(deg.select(col("item").as("i2"), col("n").as("nb"))), "i2")
        .crossJoin(broadcast(nu))
        .select(col("i1"), col("i2"), col("n_ab"),
          expr("1000000L * n_ab div na").as("conf_ppm"),
          expr("1000000L * n_ab * nu div (na * nb)").as("lift_ppm"))
        .orderBy(col("lift_ppm").desc, col("i1"), col("i2"))
        .limit(50)
    },

    // INTER-ARRIVAL burstiness — per event type: the arrival rate (µs
    // between events, exact integer mean as a cross-multiplied ratio)
    // and the squared coefficient of variation CV² = (n·Σg² − (Σg)²) /
    // (Σg)² — CV² ≈ 1 is Poisson, ≫1 is bursty — the traffic-shape
    // screen capacity planning reads next to ev25's peak gauge. Gap
    // moments are exact DECIMAL(38,0)/HUGEINT (Σg² overflows Int64);
    // ONE LAG window keyed by type + one aggregate.
    QueryDef("ev31_interarrival",
      """WITH o AS (SELECT event_type, epoch_us(ts) AS tus, event_id FROM events),
        |l AS (SELECT event_type,
        |        tus - LAG(tus) OVER (PARTITION BY event_type ORDER BY tus, event_id) AS g
        |      FROM o),
        |gaps AS (SELECT event_type, CAST(g AS HUGEINT) AS g FROM l WHERE g IS NOT NULL),
        |a AS (SELECT event_type, CAST(COUNT(*) AS HUGEINT) AS n,
        |        SUM(g) AS sg, SUM(g * g) AS sg2
        |      FROM gaps GROUP BY 1)
        |SELECT event_type, CAST(n AS BIGINT) AS n_gaps,
        |  CAST(sg // n AS BIGINT) AS mean_gap_us,
        |  CAST(n * sg2 - sg * sg AS DOUBLE) / CAST(sg * sg AS DOUBLE) AS cv2
        |FROM a ORDER BY 1""".stripMargin) { (s, d) =>
      val d38 = DecimalType(38, 0)
      val w = Window.partitionBy("event_type").orderBy("tus", "event_id")
      val gaps = ev(s, d)
        .select(col("event_type"), unix_micros(col("ts")).as("tus"), col("event_id"))
        .withColumn("g", (col("tus") - lag("tus", 1).over(w)).cast(d38))
        .filter(col("g").isNotNull)
      gaps.groupBy("event_type")
        .agg(count(lit(1)).cast(d38).as("n"), sum("g").as("sg"),
          sum(col("g") * col("g")).as("sg2"))
        .select(col("event_type"), col("n").cast(LongType).as("n_gaps"),
          expr("cast(sg div n as bigint)").as("mean_gap_us"),
          ((col("n") * col("sg2") - col("sg") * col("sg")).cast(DoubleType) /
            (col("sg") * col("sg")).cast(DoubleType)).as("cv2"))
        .orderBy("event_type")
    },

    // SEASONALITY INDEX — day-of-week factors per event type: how much
    // busier is a Tuesday than this type's average day, in exact ppm.
    // Division-order traps avoided by cross-multiplying integer sums
    // (1e6·n_dow·days_total // (days_dow·n_total)) — one (type, dow)
    // aggregate + one broadcast of the 5-row totals; the factor table
    // a forecaster divides out before trend-fitting.
    QueryDef("ev28_seasonality",
      """WITH e AS (SELECT event_type, date_trunc('day', ts) AS day,
        |             (epoch_us(ts) // 86400000000) % 7 AS dow FROM events),
        |byd AS (SELECT event_type, dow, CAST(COUNT(*) AS BIGINT) AS n,
        |          CAST(COUNT(DISTINCT day) AS BIGINT) AS days
        |        FROM e GROUP BY 1, 2),
        |tot AS (SELECT event_type, SUM(n) AS n_tot, SUM(days) AS days_tot
        |        FROM byd GROUP BY 1)
        |SELECT b.event_type, b.dow, b.n,
        |  CAST(1000000 * b.n * t.days_tot // (b.days * t.n_tot) AS BIGINT) AS index_ppm
        |FROM byd b JOIN tot t ON t.event_type = b.event_type
        |ORDER BY 1, 2""".stripMargin) { (s, d) =>
      val e = ev(s, d).select(col("event_type"), date_trunc("day", col("ts")).as("day"),
        expr("(unix_micros(ts) div 86400000000L) % 7").as("dow"))
      val byd = e.groupBy("event_type", "dow")
        .agg(count(lit(1)).as("n"), countDistinct("day").as("days"))
      val tot = byd.groupBy("event_type")
        .agg(sum("n").as("n_tot"), sum("days").as("days_tot"))
      byd.join(broadcast(tot), "event_type")
        .select(col("event_type"), col("dow"), col("n"),
          expr("1000000L * n * days_tot div (days * n_tot)").as("index_ppm"))
        .orderBy("event_type", "dow")
    },

    // Markov next-event PREDICTION EVAL — ev10's transition matrix used
    // as a first-order model and scored on the same stream: for every
    // (prev → next) step, the model predicts argmax-count next type
    // given prev (ties → lexicographically smallest, identical rule in
    // both engines); accuracy = hit fraction in exact ppm. The
    // train-on-corpus/score-on-corpus loop every sequence model starts
    // from; the matrix is a ≤25-row broadcast, the scoring pass is the
    // same LAG window ev10 already pays.
    QueryDef("ev27_markov_eval",
      """WITH o AS (SELECT user_id, event_type, epoch_us(ts) AS tus, event_id FROM events),
        |l AS (SELECT event_type AS next_t,
        |        LAG(event_type) OVER (PARTITION BY user_id ORDER BY tus, event_id) AS prev_t
        |      FROM o),
        |steps AS (SELECT prev_t, next_t FROM l WHERE prev_t IS NOT NULL),
        |m AS (SELECT prev_t, next_t, COUNT(*) AS c FROM steps GROUP BY 1, 2),
        |pred AS (SELECT prev_t, next_t AS pred_t FROM (
        |  SELECT prev_t, next_t,
        |    ROW_NUMBER() OVER (PARTITION BY prev_t ORDER BY c DESC, next_t) AS rn
        |  FROM m) WHERE rn = 1)
        |SELECT s.prev_t, p.pred_t,
        |  CAST(COUNT(*) AS BIGINT) AS n_steps,
        |  CAST(SUM(CASE WHEN s.next_t = p.pred_t THEN 1 ELSE 0 END) AS BIGINT) AS n_hits,
        |  CAST(1000000 * SUM(CASE WHEN s.next_t = p.pred_t THEN 1 ELSE 0 END)
        |       // COUNT(*) AS BIGINT) AS acc_ppm
        |FROM steps s JOIN pred p ON p.prev_t = s.prev_t
        |GROUP BY 1, 2 ORDER BY 1""".stripMargin) { (s, d) =>
      val w = Window.partitionBy("user_id").orderBy("tus", "event_id")
      val steps = ev(s, d)
        .select(col("user_id"), col("event_type"), unix_micros(col("ts")).as("tus"),
          col("event_id"))
        .withColumn("prev_t", lag("event_type", 1).over(w))
        .filter(col("prev_t").isNotNull)
        .select(col("prev_t"), col("event_type").as("next_t"))
      val m = steps.groupBy("prev_t", "next_t").agg(count(lit(1)).as("c"))
      // argmax count, ties → smallest type: MIN over (−count, type)
      val pred = m
        .groupBy("prev_t")
        .agg(min(struct((-col("c")).as("nc"), col("next_t").as("t"))).as("b"))
        .select(col("prev_t"), col("b.t").as("pred_t"))
      steps.join(broadcast(pred), "prev_t")
        .groupBy("prev_t", "pred_t")
        .agg(count(lit(1)).as("n_steps"),
          sum(when(col("next_t") === col("pred_t"), 1L).otherwise(0L)).as("n_hits"))
        .select(col("prev_t"), col("pred_t"), col("n_steps"), col("n_hits"),
          expr("1000000L * n_hits div n_steps").as("acc_ppm"))
        .orderBy("prev_t")
    },

    // Cohort LTV — cumulative purchase revenue per (cohort day, age):
    // ev9's retention triangle with MONEY instead of presence, and a
    // running cumsum across each cohort's ages so every cell answers
    // "revenue per cohort so far by day k" directly. Revenue sums are
    // exact integer milli-units; the cumsum is one window over the TINY
    // (cohort × age) aggregate — the heavy reduction happens in the
    // map-side-combined groupBy below it, never in the window.
    QueryDef("ev26_cohort_ltv",
      """WITH f AS (SELECT user_id, MIN(date_trunc('day', ts)) AS cohort
        |           FROM events GROUP BY 1),
        |p AS (SELECT e.user_id, f.cohort,
        |        CAST(date_diff('day', f.cohort, date_trunc('day', e.ts)) AS BIGINT) AS age,
        |        CAST(ROUND(e.value * 1000) AS BIGINT) AS vm
        |      FROM events e JOIN f ON f.user_id = e.user_id
        |      WHERE e.event_type = 'purchase'),
        |g AS (SELECT cohort, age, SUM(vm) AS rev, COUNT(*) AS n
        |      FROM p GROUP BY 1, 2)
        |SELECT strftime(cohort, '%Y-%m-%d') AS cohort_day, age,
        |  CAST(n AS BIGINT) AS n_purchases, CAST(rev AS BIGINT) AS rev_milli,
        |  CAST(SUM(rev) OVER (PARTITION BY cohort ORDER BY age
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_rev_milli
        |FROM g ORDER BY cohort_day, age""".stripMargin) { (s, d) =>
      val evd = ev(s, d)
      val f = evd.groupBy("user_id").agg(min(date_trunc("day", col("ts"))).as("cohort"))
      val g = evd.filter(col("event_type") === "purchase")
        .join(f, "user_id")
        .groupBy(col("cohort"),
          datediff(to_date(date_trunc("day", col("ts"))), to_date(col("cohort")))
            .cast(LongType).as("age"))
        .agg(sum(floor(col("value") * 1000 + 0.5).cast(LongType)).as("rev"),
          count(lit(1)).as("n"))
      g.select(date_format(col("cohort"), "yyyy-MM-dd").as("cohort_day"), col("age"),
          col("n").as("n_purchases"), col("rev").cast(LongType).as("rev_milli"),
          sum("rev").over(Window.partitionBy("cohort").orderBy("age")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow))
            .cast(LongType).as("cum_rev_milli"))
        .orderBy("cohort_day", "age")
    },

    // PEAK CONCURRENCY — max simultaneously-open sessions per day, the
    // capacity-planning gauge (how many live connections/users must the
    // serving tier hold?). Sweep-line over session intervals: ±1 deltas
    // at the (day-clipped) endpoints, one DAY-PARTITIONED ordered window
    // for the running count — sessions crossing midnight explode to one
    // row per covered day, so the sweep distributes by day instead of a
    // single global sort. Touching sessions (one starts at the instant
    // another ends) COUNT as concurrent: +1 sorts before −1 on the tie,
    // identically in both engines.
    QueryDef("ev25_concurrency",
      """WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS tus FROM events),
        |l AS (SELECT *, LAG(tus) OVER (PARTITION BY user_id ORDER BY tus, event_id) AS prev FROM e),
        |f AS (SELECT *, CASE WHEN prev IS NULL OR tus - prev > 1800000000 THEN 1 ELSE 0 END AS brk FROM l),
        |s AS (SELECT *, SUM(brk) OVER (PARTITION BY user_id ORDER BY tus, event_id
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id FROM f),
        |sess AS (SELECT user_id, session_id, MIN(tus) AS s0, MAX(tus) AS s1
        |         FROM s GROUP BY 1, 2),
        |dayspan AS (SELECT user_id, session_id, s0, s1,
        |              UNNEST(range(s0 // 86400000000, s1 // 86400000000 + 1)) AS day
        |            FROM sess),
        |clip AS (SELECT day, user_id, session_id,
        |           GREATEST(s0, day * 86400000000) AS c0,
        |           LEAST(s1, (day + 1) * 86400000000 - 1) AS c1
        |         FROM dayspan),
        |pts AS (SELECT day, c0 AS t, 1 AS delta, user_id, session_id FROM clip
        |        UNION ALL
        |        SELECT day, c1, -1, user_id, session_id FROM clip),
        |run AS (SELECT day, SUM(delta) OVER (PARTITION BY day
        |          ORDER BY t, delta DESC, user_id, session_id
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS conc FROM pts),
        |pk AS (SELECT day, MAX(conc) AS peak FROM run GROUP BY 1),
        |cnt AS (SELECT day, CAST(COUNT(*) AS BIGINT) AS n_sessions FROM clip GROUP BY 1)
        |SELECT CAST(c.day AS BIGINT) AS epoch_day, CAST(pk.peak AS BIGINT) AS peak,
        |  c.n_sessions
        |FROM cnt c JOIN pk ON pk.day = c.day ORDER BY 1""".stripMargin) { (s, d) =>
      val uw = Window.partitionBy("user_id").orderBy("tus", "event_id")
      val sess = ev(s, d)
        .select(col("user_id"), col("event_id"), unix_micros(col("ts")).as("tus"))
        .withColumn("prev", lag("tus", 1).over(uw))
        .withColumn("brk",
          when(col("prev").isNull || col("tus") - col("prev") > 1800000000L, 1).otherwise(0))
        .withColumn("session_id",
          sum("brk").over(uw.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .groupBy("user_id", "session_id")
        .agg(min("tus").as("s0"), max("tus").as("s1"))
      val day = 86400000000L
      val clip = sess
        .withColumn("day", explode(sequence(expr(s"s0 div ${day}L"), expr(s"s1 div ${day}L"))))
        .select(col("day"), col("user_id"), col("session_id"),
          greatest(col("s0"), col("day") * day).as("c0"),
          least(col("s1"), (col("day") + 1) * day - 1).as("c1"))
      val pts = clip.select(col("day"), col("c0").as("t"), lit(1).as("delta"),
          col("user_id"), col("session_id"))
        .union(clip.select(col("day"), col("c1").as("t"), lit(-1).as("delta"),
          col("user_id"), col("session_id")))
      val dw = Window.partitionBy("day")
        .orderBy(col("t"), col("delta").desc, col("user_id"), col("session_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      // BOTH outputs come off the one windowed sweep: peak = max running
      // concurrency, n_sessions = count of +1 points (= clip rows). The
      // former cnt-branch recomputed the whole sessionize pipeline a
      // second time and joined it back; fused = one subtree, no join
      // (sf1 7.2 → 6.7 s — the residual is the per-user sessionize
      // window itself, inherent to the operator).
      pts.withColumn("conc", sum("delta").over(dw))
        .groupBy("day").agg(max("conc").as("peak"),
          sum(when(col("delta") === 1, 1L).otherwise(0L)).as("n_sessions"))
        .select(col("day").cast(LongType).as("epoch_day"),
          col("peak").cast(LongType).as("peak"), col("n_sessions"))
        .orderBy("epoch_day")
    },

    // Funnel TIME-TO-CONVERT — how long view→purchase takes: per user,
    // the first purchase at-or-after the first view; converters'
    // latency distribution summarized by exact nearest-rank p50/p90
    // (quantile_disc semantics — ops.ExactQuantile's histogram+refine,
    // two codegen'd scans, no global sort) on integer microsecond
    // deltas. The ev8 funnel says HOW MANY convert; this says HOW FAST
    // — the pair product teams read together.
    QueryDef("ev24_time_to_convert",
      """WITH v AS (SELECT user_id, MIN(epoch_us(ts)) AS v0 FROM events
        |           WHERE event_type = 'view' GROUP BY 1),
        |p AS (SELECT e.user_id, MIN(epoch_us(e.ts)) AS p0
        |      FROM events e JOIN v ON v.user_id = e.user_id
        |      WHERE e.event_type = 'purchase' AND epoch_us(e.ts) >= v.v0
        |      GROUP BY 1),
        |dlt AS (SELECT p.user_id, p.p0 - v.v0 AS d FROM p JOIN v USING (user_id)),
        |n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_conv FROM dlt),
        |o AS (SELECT d, ROW_NUMBER() OVER (ORDER BY d) AS rn FROM dlt)
        |SELECT n.n_conv,
        |  CAST(MAX(CASE WHEN o.rn = CAST(CEIL(0.5 * CAST(n.n_conv AS DOUBLE)) AS BIGINT)
        |       THEN o.d END) AS BIGINT) AS p50_us,
        |  CAST(MAX(CASE WHEN o.rn = CAST(CEIL(0.9 * CAST(n.n_conv AS DOUBLE)) AS BIGINT)
        |       THEN o.d END) AS BIGINT) AS p90_us
        |FROM o, n GROUP BY n.n_conv""".stripMargin) { (s, d) =>
      val evd = ev(s, d)
      val v = evd.filter(col("event_type") === "view")
        .groupBy("user_id").agg(min(unix_micros(col("ts"))).as("v0"))
      val p = evd.filter(col("event_type") === "purchase")
        .select(col("user_id"), unix_micros(col("ts")).as("tus"))
        .join(v, "user_id")
        .filter(col("tus") >= col("v0"))
        .groupBy("user_id").agg(min(col("tus")).as("p0"))
      val dlt = p.join(v, "user_id").select((col("p0") - col("v0")).as("d"))
      graft.ops.ExactQuantile
        .rankStatsByKey(dlt, lit(1L), col("d"), Seq(0.5, 0.9))
        .groupBy()
        .agg(first("n").as("n_conv"),
          max(when(col("__i") === 0, col("value"))).as("p50_us"),
          max(when(col("__i") === 1, col("value"))).as("p90_us"))
        // zero converters: the global agg over an empty frame emits one
        // all-NULL row while the oracle's GROUP BY n_conv emits none —
        // drop it so both engines agree on degenerate inputs
        .filter(col("n_conv").isNotNull)
        .select(col("n_conv"), col("p50_us"), col("p90_us"))
    },

    // POINT-IN-TIME enrichment — the feature-store correctness join:
    // each purchase is labeled with the SCD2 dimension attribute (the
    // user's current item, ev18's intervals) that was valid AT THE
    // PURCHASE INSTANT — never a later value (leakage) nor a stale one.
    // Composition: Scd2.fromHistory change-points + the ev4 as-of
    // machinery (union + ONE keyed window pass — no interval range
    // join); ties at a change instant resolve to the NEW value on both
    // engines (dim row sorts first / ASOF >=). Purchases before any
    // view stay NULL (left as-of).
    QueryDef("ev23_pit_enrichment",
      """WITH e AS (SELECT user_id, epoch_us(ts) AS tus, event_id,
        |             CAST(props->>'k' AS BIGINT) AS item
        |           FROM events WHERE event_type = 'view'),
        |obs AS (SELECT user_id, tus, max_by(item, event_id) AS item FROM e GROUP BY 1, 2),
        |l AS (SELECT *, LAG(item) OVER (PARTITION BY user_id ORDER BY tus) AS prev FROM obs),
        |cp AS (SELECT user_id, tus, item FROM l WHERE prev IS NULL OR prev <> item),
        |f AS (SELECT user_id, epoch_us(ts) AS tus, event_id,
        |        CAST(ROUND(value * 1000) AS BIGINT) AS vm
        |      FROM events WHERE event_type = 'purchase')
        |SELECT f.user_id, f.event_id, f.vm AS value_milli, cp.item AS item_at_purchase
        |FROM f ASOF LEFT JOIN cp ON f.user_id = cp.user_id AND f.tus >= cp.tus
        |ORDER BY f.user_id, f.event_id""".stripMargin) { (s, d) =>
      val evd = ev(s, d)
      val log = evd.filter(col("event_type") === "view")
        .select(col("user_id"), unix_micros(col("ts")).as("tus"), col("event_id"),
          graft.ops.EventProps.propsK(col("props")).as("item"))
        .groupBy("user_id", "tus")
        .agg(max_by(col("item"), col("event_id")).as("item"))
      val dim = graft.ops.Scd2.fromHistory(log, Seq("user_id"), "tus", Seq("item"))
        .select(col("user_id"), col("valid_from").as("tus"), col("item"))
      val facts = evd.filter(col("event_type") === "purchase")
        .select(col("user_id"), unix_micros(col("ts")).as("tus"), col("event_id"),
          floor(col("value") * 1000 + 0.5).cast(LongType).as("value_milli"))
      graft.ops.TimeSeriesOps.asOfJoin(facts, dim, "user_id", "tus", "item", "item_at_purchase")
        .select("user_id", "event_id", "value_milli", "item_at_purchase")
        .orderBy("user_id", "event_id")
    },

    // Mann–Whitney U (Wilcoxon rank-sum) with tie correction — the
    // NONPARAMETRIC sibling of ev20's t-test: compares the per-day
    // 'view' vs 'purchase' value DISTRIBUTIONS by rank, robust to the
    // heavy tails a mean-based test washes out. All rank math is exact
    // integer: values quantize to milli-units, average ranks are kept
    // ×2 (2·avgrank = 2·count_below + ties + 1 is always integral), and
    // the tie-corrected variance is an exact wide-integer expression
    // (DECIMAL(38,0) ↔ HUGEINT, the ev20 pattern — N³·n1·n2 overflows
    // Int64 from ~sf1) divided/√'d in double IDENTICALLY on both
    // engines. Distribution-wise: one (day, value) aggregate, one
    // day-keyed window, one day aggregate — all shuffles on bounded
    // keys; no per-row sort rank materialization (ranks come from value
    // GROUP counts, so ties cost one row, not t rows).
    QueryDef("ev22_mannwhitney",
      """WITH m AS (SELECT date_trunc('day', ts) AS day,
        |             CASE WHEN event_type = 'view' THEN 1 ELSE 0 END AS g,
        |             CAST(ROUND(value * 1000) AS BIGINT) AS vm
        |           FROM events WHERE event_type IN ('view', 'purchase')),
        |tv AS (SELECT day, vm, CAST(COUNT(*) AS HUGEINT) AS t,
        |         CAST(SUM(g) AS HUGEINT) AS t1
        |       FROM m GROUP BY 1, 2),
        |cum AS (SELECT day, t, t1,
        |          SUM(t) OVER (PARTITION BY day ORDER BY vm
        |                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS c
        |        FROM tv),
        |agg AS (SELECT day,
        |          SUM(t1) AS n1, SUM(t) - SUM(t1) AS n2, SUM(t) AS nn,
        |          SUM(t1 * (2 * COALESCE(c, 0) + t + 1)) AS r2x,
        |          SUM(t * t * t - t) AS ties
        |        FROM cum GROUP BY day)
        |SELECT strftime(day, '%Y-%m-%d') AS day,
        |  CAST(n1 AS BIGINT) AS n_view, CAST(n2 AS BIGINT) AS n_purchase,
        |  CAST(r2x - n1 * (n1 + 1) AS BIGINT) AS u2x,
        |  CAST(r2x - n1 * (n1 + 1) - n1 * n2 AS DOUBLE) /
        |    sqrt(CAST(n1 * n2 * ((nn + 1) * nn * (nn - 1) - ties) AS DOUBLE) /
        |         CAST(3 * nn * (nn - 1) AS DOUBLE)) AS z
        |FROM agg ORDER BY 1""".stripMargin) { (s, d) =>
      val d38 = DecimalType(38, 0)
      val base = ev(s, d).filter(col("event_type").isin("view", "purchase"))
        .select(date_trunc("day", col("ts")).as("day"),
          when(col("event_type") === "view", 1L).otherwise(0L).as("g"),
          floor(col("value") * 1000 + 0.5).cast(LongType).as("vm"))
      val tv = base.groupBy("day", "vm")
        .agg(count(lit(1)).cast(d38).as("t"), sum("g").cast(d38).as("t1"))
      val w = Window.partitionBy("day").orderBy("vm")
        .rowsBetween(Window.unboundedPreceding, -1)
      val cum = tv.withColumn("c", sum("t").over(w))
      val agg = cum.groupBy("day")
        .agg(sum("t1").as("n1"), (sum("t") - sum("t1")).as("n2"), sum("t").as("nn"),
          sum(col("t1") * (lit(2) * coalesce(col("c"), lit(0).cast(d38)) + col("t") + lit(1)))
            .as("r2x"),
          sum(col("t") * col("t") * col("t") - col("t")).as("ties"))
      agg.select(date_format(col("day"), "yyyy-MM-dd").as("day"),
          col("n1").cast(LongType).as("n_view"), col("n2").cast(LongType).as("n_purchase"),
          (col("r2x") - col("n1") * (col("n1") + lit(1))).cast(LongType).as("u2x"),
          ((col("r2x") - col("n1") * (col("n1") + lit(1)) - col("n1") * col("n2")).cast(DoubleType) /
            sqrt((col("n1") * col("n2") *
                ((col("nn") + lit(1)) * col("nn") * (col("nn") - lit(1)) - col("ties")))
              .cast(DoubleType) /
              (lit(3) * col("nn") * (col("nn") - lit(1))).cast(DoubleType))).as("z"))
        .orderBy("day")
    }
  )

  /** ev20's final projection: the day-keyed join + exact-decimal
    * significance inequality. */
  private def abJoin(a: org.apache.spark.sql.DataFrame, b: org.apache.spark.sql.DataFrame,
                     dn: org.apache.spark.sql.Column): org.apache.spark.sql.DataFrame = {
      a.join(b, col("day") === col("day2"))
        .select(date_format(col("day"), "yyyy-MM-dd").as("day"),
          col("n1").cast(LongType).as("n_view"), col("n2").cast(LongType).as("n_purchase"),
          (dn.cast(DoubleType) / (col("n1") * col("n2")).cast(DoubleType)).as("mean_diff_milli"),
          (dn * dn * col("n1") * col("n2") >
            lit(4) * ((col("n1") * col("q1") - col("s1") * col("s1")) * col("n2") * col("n2") * col("n2") +
              (col("n2") * col("q2") - col("s2") * col("s2")) * col("n1") * col("n1") * col("n1")))
            .as("significant"))
        .orderBy("day")
  }
}
