package graft

import org.apache.spark.sql.SparkSession

/** Library-wide session defaults every graft entrypoint applies after
  * building its SparkSession (runtime confs only — nothing here changes
  * plan shapes, so Explain output is identical with or without it).
  */
object Sessions {

  /** Spark's ObjectHashAggregate falls back to SORT-BASED aggregation
    * after seeing just 128 distinct groups per partition (the object
    * buffers are opaque to the memory manager, so the default is
    * maximally conservative). Every TypedImperativeAggregate in this
    * library carries a deliberately BOUNDED buffer — TopKScored k
    * entries, KLL/MinK/MisraGries fixed capacity — so the hash path is
    * ~250 B/group and strictly cheaper than the fallback, which re-sorts
    * the whole remaining input through UnsafeKVExternalSorter (each
    * spill file then pins a 1 MiB read-ahead buffer at merge time: the
    * first OOM on a starved heap in ProbeSpill round 17, where the
    * banded kNN candidate stream hit the fallback at 20k groups).
    * 262144 groups ≈ 64 MiB/task worst-case keeps the hash path for
    * every per-partition group count this library produces while staying
    * bounded if a partition somehow carries millions of groups.
    */
  val ObjectAggFallbackGroups = 262144

  /** Apply runtime defaults to a built session. Values already set by
    * the user (spark-defaults, --conf, or an earlier set) are kept.
    *
    * INTERACTION NOTE — the raised fallback threshold is session-global,
    * so it also governs Spark's UNBOUNDED-buffer object aggregates
    * (collect_list / collect_set / percentile): with it, up to
    * `fallbackGroups` live group buffers can accumulate per partition
    * before the sort-based degradation kicks in, where the stock 128
    * capped that exposure. For this library's aggregates that trade is
    * strictly right (buffers are ~250 B bounded; the fallback's
    * spill-merge is what actually OOMed at 640 MiB — ProbeSpill r17).
    * Pipelines that mix in unbounded collect_* over huge groups on
    * constrained heaps should dial `graft.objectAgg.fallbackGroups`
    * down (or preset the Spark key themselves — tune never overrides a
    * non-default value). */
  def tune(spark: SparkSession): SparkSession = {
    val key = "spark.sql.objectHashAggregate.sortBased.fallbackThreshold"
    val groups = spark.conf.getOption("graft.objectAgg.fallbackGroups") match {
      case None => ObjectAggFallbackGroups
      case Some(raw) =>
        // validate loudly, naming the key: a malformed templated value
        // must not surface as a bare NumberFormatException at bootstrap,
        // and a non-positive threshold would disable hash aggregation
        val n = try raw.trim.toInt catch {
          case _: NumberFormatException => throw new IllegalArgumentException(
            s"graft.objectAgg.fallbackGroups must be a positive integer, got '$raw'")
        }
        require(n > 0, s"graft.objectAgg.fallbackGroups must be positive, got $n")
        n
    }
    if (spark.conf.getOption(key).forall(_ == "128"))
      spark.conf.set(key, groups.toString)
    spark
  }
}
