package graft.queries

import graft.{QueryDef, Tables}
import graft.ops.TimeSeriesOps
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Second wave of scalar-function + composed-operator coverage: JSON
  * extraction, regex functions, array/list functions, as-of join and
  * gap-fill resampling (SURVEY §2.8 + beyond-reference time-series ops).
  */
object Functions2 {

  val defs: Seq[QueryDef] = Seq(

    QueryDef("q27_json_funcs",
      """SELECT event_id,
        |  CAST(props->>'k' AS BIGINT) AS k,
        |  CAST(json_valid(props) AS BOOLEAN) AS ok
        |FROM events WHERE event_id < 100 ORDER BY event_id""".stripMargin) { (s, d) =>
      Tables.load(s, d, "events").filter(col("event_id") < 100)
        .select(
          col("event_id"),
          get_json_object(col("props"), "$.k").cast(LongType).as("k"),
          get_json_object(col("props"), "$.k").isNotNull.as("ok"))
        .orderBy("event_id")
    },

    QueryDef("q28_regex_funcs",
      """SELECT p_partkey,
        |  regexp_extract(p_type, '([a-z]+)$', 1) AS last_word,
        |  CAST(regexp_matches(p_name, '^[a-m]') AS BOOLEAN) AS starts_early,
        |  regexp_replace(p_name, '[aeiou]', '_', 'g') AS devoweled
        |FROM part WHERE p_partkey <= 150 ORDER BY p_partkey""".stripMargin) { (s, d) =>
      Tables.load(s, d, "part").filter(col("p_partkey") <= 150)
        .select(
          col("p_partkey"),
          regexp_extract(col("p_type"), "([a-z]+)$", 1).as("last_word"),
          col("p_name").rlike("^[a-m]").as("starts_early"),
          regexp_replace(col("p_name"), "[aeiou]", "_").as("devoweled"))
        .orderBy("p_partkey")
    },

    QueryDef("q29_array_funcs",
      """SELECT vec_id,
        |  CAST(len(embedding) AS BIGINT) AS dim,
        |  CAST(embedding[1] AS DOUBLE) AS first_el,
        |  CAST(list_min(embedding) AS DOUBLE) AS mn,
        |  CAST(list_max(embedding) AS DOUBLE) AS mx,
        |  CAST(len(list_filter(embedding, x -> x > 0)) AS BIGINT) AS n_pos
        |FROM embeddings WHERE vec_id < 50 ORDER BY vec_id""".stripMargin) { (s, d) =>
      Tables.load(s, d, "embeddings").filter(col("vec_id") < 50)
        .select(
          col("vec_id"),
          size(col("embedding")).cast(LongType).as("dim"),
          element_at(col("embedding"), 1).cast(DoubleType).as("first_el"),
          array_min(col("embedding")).cast(DoubleType).as("mn"),
          array_max(col("embedding")).cast(DoubleType).as("mx"),
          size(filter(col("embedding"), x => x > 0)).cast(LongType).as("n_pos"))
        .orderBy("vec_id")
    },

    QueryDef("ev4_asof_join",
      """WITH l AS (SELECT user_id, epoch_us(ts) AS tus, event_id, value FROM events WHERE event_type = 'purchase'),
        |r AS (SELECT user_id, epoch_us(ts) AS tus, MAX(value) AS vw FROM events WHERE event_type = 'view' GROUP BY 1, 2)
        |SELECT l.user_id, l.event_id, l.value, r.vw AS last_view_value
        |FROM l ASOF LEFT JOIN r ON l.user_id = r.user_id AND l.tus >= r.tus
        |ORDER BY l.user_id, l.event_id""".stripMargin) { (s, d) =>
      val ev = Tables.load(s, d, "events")
      val left = ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), unix_micros(col("ts")).as("tus"), col("event_id"), col("value"))
      val right = ev.filter(col("event_type") === "view")
        .groupBy(col("user_id"), unix_micros(col("ts")).as("tus"))
        .agg(max("value").as("vw"))
      TimeSeriesOps.asOfJoin(left, right, "user_id", "tus", "vw", "last_view_value")
        .select("user_id", "event_id", "value", "last_view_value")
        .orderBy("user_id", "event_id")
    },

    QueryDef("ev5_gapfill_resample",
      """WITH b AS (SELECT event_type, (epoch_us(ts) // 3600000000) * 3600000000 AS bucket,
        |             CAST(SUM(CAST(value AS DECIMAL(25,6))) AS DOUBLE) AS v
        |           FROM events GROUP BY 1, 2),
        |g AS (SELECT event_type, UNNEST(range(mn, mx + 1, 3600000000)) AS bucket
        |      FROM (SELECT event_type, MIN(bucket) AS mn, MAX(bucket) AS mx FROM b GROUP BY 1)),
        |j AS (SELECT g.event_type, g.bucket, b.v FROM g LEFT JOIN b ON g.event_type = b.event_type AND g.bucket = b.bucket)
        |SELECT event_type, CAST(bucket AS BIGINT) AS bucket_start_us,
        |  LAST_VALUE(v IGNORE NULLS) OVER (PARTITION BY event_type ORDER BY bucket
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS value,
        |  v IS NULL AS filled
        |FROM j ORDER BY event_type, bucket_start_us""".stripMargin) { (s, d) =>
      TimeSeriesOps.gapFillResample(
          Tables.load(s, d, "events"), "event_type", "ts",
          sum(col("value").cast(DecimalType(25, 6))).cast(DoubleType), 3600L)
        .orderBy("event_type", "bucket_start_us")
    },

    // Semi-structured VARIANT path — Spark 4's binary JSON encoding:
    // `parse_json` pays the parse cost ONCE per row, then every
    // `variant_get` is a typed binary walk (no string re-parse), which
    // is the engine-honest way to shred a JSON payload column at 100 TB
    // (the reference reaches the same data through DataFusion's string
    // JSON functions, re-parsing per extraction). Absent paths yield
    // NULL, exercised alongside the typed extraction. The oracle reads
    // the identical values through DuckDB's JSON operators.
    QueryDef("q50_variant_shred",
      """WITH j AS (SELECT CAST(props->>'k' AS BIGINT) AS item,
        |             CASE WHEN json_extract(props, '$.missing') IS NULL THEN 1 ELSE 0 END AS miss
        |           FROM events WHERE event_type = 'view')
        |SELECT item % 10 AS item_mod, CAST(COUNT(*) AS BIGINT) AS n,
        |  CAST(SUM(item) AS BIGINT) AS sum_item, CAST(SUM(miss) AS BIGINT) AS n_missing
        |FROM j GROUP BY 1 ORDER BY 1""".stripMargin) { (s, d) =>
      Tables.sql(s, d,
        """WITH j AS (SELECT parse_json(props) AS pv FROM events WHERE event_type = 'view'),
          |x AS (SELECT CAST(variant_get(pv, '$.k') AS BIGINT) AS item,
          |        CASE WHEN variant_get(pv, '$.missing') IS NULL THEN 1 ELSE 0 END AS miss
          |      FROM j)
          |SELECT item % 10 AS item_mod, CAST(COUNT(*) AS BIGINT) AS n,
          |  CAST(SUM(item) AS BIGINT) AS sum_item, CAST(SUM(miss) AS BIGINT) AS n_missing
          |FROM x GROUP BY 1 ORDER BY 1""".stripMargin)
    }
  )
}
