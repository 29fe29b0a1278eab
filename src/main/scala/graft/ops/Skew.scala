package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation helpers for heavy-hitter keys — at 100 TB a handful of
  * hot keys (one giant user, one dominant token) can stall a stage behind
  * a single reducer. AQE's skew-join handling covers sort-merge joins;
  * these cover aggregations and broadcast-unfriendly shapes.
  */
object Skew {

  /** Two-phase salted aggregation: rows are spread over `saltBuckets`
    * sub-keys, partially aggregated per (key, salt), then re-aggregated
    * per key. Correct for any algebraic aggregate expressed as
    * (partial, merge) column pairs — e.g. count/sum/min/max.
    *
    * partials: (name, partialAgg, mergeAgg-over-partial-name).
    */
  def saltedAgg(df: DataFrame, keyCols: Seq[String], saltBuckets: Int,
                partials: Seq[(String, Column, String => Column)]): DataFrame = {
    val salted = df.withColumn("__salt", pmod(spark_partition_id() + monotonically_increasing_id(), lit(saltBuckets)))
    val phase1 = salted
      .groupBy((keyCols.map(col) :+ col("__salt")): _*)
      .agg(partials.head._2.as(partials.head._1),
        partials.tail.map(p => p._2.as(p._1)): _*)
    phase1
      .groupBy(keyCols.map(col): _*)
      .agg(partials.head._3(partials.head._1).as(partials.head._1),
        partials.tail.map(p => p._3(p._1).as(p._1)): _*)
  }

  /** Convenience: salted count + sum for one value column. */
  def saltedCountSum(df: DataFrame, keyCols: Seq[String], valueCol: String,
                     saltBuckets: Int = 16): DataFrame =
    saltedAgg(df, keyCols, saltBuckets, Seq(
      ("n", count(lit(1)), (c: String) => sum(col(c))),
      ("total", sum(col(valueCol)), (c: String) => sum(col(c)))))

  /** Salted equi-join for a skewed big side: big rows scatter across
    * `saltBuckets` sub-keys, the small side replicates once per salt, and
    * the join key becomes (key, salt) — a hot key's rows now land on
    * `saltBuckets` reducers instead of one. Inner/left semantics match
    * the plain join exactly (every big row meets every matching small row
    * exactly once, at its own salt). Cost: small side × saltBuckets —
    * use when the small side is modest but above the broadcast threshold
    * and the big side's key histogram is spiked.
    */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
                 saltBuckets: Int = 16, joinType: String = "inner"): DataFrame = {
    val bigS = big.withColumn("__salt",
      pmod(spark_partition_id() + monotonically_increasing_id(), lit(saltBuckets)))
    val smallS = small
      .withColumn("__salt", explode(sequence(lit(0L), lit(saltBuckets - 1L))))
    bigS.join(smallS, Seq(key, "__salt"), joinType).drop("__salt")
  }
}
