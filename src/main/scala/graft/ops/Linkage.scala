package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Blocked fuzzy record linkage (entity resolution) — finding records
  * that NAME the same real-world thing with slightly different strings
  * (typos, OCR noise, vendor-feed drift). The classic shape a catalog /
  * training-metadata pipeline needs before any exact-key dedup can work.
  *
  * Scale decomposition (the part that matters at 100 TB):
  *  1. the DICTIONARY of distinct names is orders of magnitude smaller
  *     than the fact table — distinct+count first (one map-side-combined
  *     aggregate), so the quadratic step never sees fact-table rows;
  *  2. BLOCKING bounds the quadratic: candidate pairs are generated only
  *     within a block key (here: a caller-supplied expression, e.g. the
  *     head noun, a phonetic code, a sorted-token prefix), turning
  *     O(N²) into Σ O(block²);
  *  3. the threshold edit distance uses Spark's 3-arg `levenshtein`,
  *     which abandons a pair as soon as the running distance exceeds the
  *     bound — O(k·min(len)) per pair, not O(len²) — after a free
  *     length-difference prefilter (|len(a)−len(b)| > k proves dist > k).
  *
  * Matched pairs then broadcast back onto the fact table (the dictionary
  * is small by construction) — callers do that join; this returns the
  * dictionary-level pair list.
  */
object Linkage {

  /** Distinct values of `nameCol` (with their fact-table frequencies),
    * self-joined within `blockKey`, kept when levenshtein ≤ maxDist.
    * Output: (name_a, name_b, dist, n_a, n_b) with name_a < name_b.
    */
  def fuzzyNamePairs(df: DataFrame, nameCol: String, blockKey: Column,
                     maxDist: Int): DataFrame = {
    require(maxDist >= 1, s"maxDist must be >= 1, got $maxDist")
    val names = df.groupBy(col(nameCol).as("name"))
      .agg(count(lit(1)).as("n"))
      .withColumn("block", blockKey)
    val a = names.select(col("name").as("name_a"), col("n").as("n_a"), col("block"))
    val b = names.select(col("name").as("name_b"), col("n").as("n_b"), col("block"))
    a.join(b, "block")
      .where(col("name_a") < col("name_b"))
      // free prefilter: edit distance is at least the length difference
      .where(abs(length(col("name_a")) - length(col("name_b"))) <= maxDist)
      // bounded-early-exit levenshtein: returns -1 once the bound is hit
      .withColumn("dist", levenshtein(col("name_a"), col("name_b"), maxDist))
      .where(col("dist") >= 0)
      .select(col("name_a"), col("name_b"), col("dist").cast(LongType),
        col("n_a"), col("n_b"))
  }
}
