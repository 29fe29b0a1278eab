package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Slowly-changing-dimension Type 2 maintenance — the warehouse pattern
  * that keeps FULL attribute history as validity intervals
  * (valid_from, valid_to, is_current) instead of overwriting in place,
  * so any fact row can join the dimension AS OF its own timestamp.
  * The reference's MERGE/CDC machinery (SyncMerge) updates in place;
  * SCD2 is the history-preserving sibling a lakehouse pipeline runs on
  * dimension feeds.
  *
  * Semantics are defined by `fromHistory` (build the interval table from
  * an observation log); `applyChanges` is the INCREMENTAL maintenance
  * loop and is bit-equivalent to a from-scratch rebuild over the merged
  * observations (OpsSpec asserts it), while only ever shuffling the
  * TOUCHED keys: untouched dimension rows pass through untouched — the
  * property that keeps a daily change batch cheap against a billion-row
  * dimension.
  */
object Scd2 {

  /** Build an SCD2 interval table from an observation log
    * (pkCols..., tsCol, attrCols...): one row per attribute CHANGE,
    * `valid_from` = the change's ts, `valid_to` = the next change's ts
    * (null while current), `is_current` on the open row. Consecutive
    * observations with identical attributes collapse (null-safe struct
    * comparison), so redundant feeds cost nothing downstream.
    * Requires (pk, ts) unique — enforced loudly by the caller's data
    * contract, since a tie would make "the next change" ambiguous.
    * One pk-keyed window sort total (both window passes share it).
    */
  def fromHistory(log: DataFrame, pkCols: Seq[String], tsCol: String,
                  attrCols: Seq[String]): DataFrame = {
    require(pkCols.nonEmpty && attrCols.nonEmpty)
    val w = Window.partitionBy(pkCols.map(col): _*).orderBy(col(tsCol))
    val attrs = struct(attrCols.map(col): _*)
    val changePoints = log
      .withColumn("__prev", lag(attrs, 1).over(w))
      .where(!(attrs <=> col("__prev")))
      .drop("__prev")
    changePoints
      .withColumn("valid_from", col(tsCol))
      .withColumn("valid_to", lead(col(tsCol), 1).over(w))
      .withColumn("is_current", col("valid_to").isNull)
      .select((pkCols ++ attrCols).map(col) ++
        Seq(col("valid_from"), col("valid_to"), col("is_current")): _*)
  }

  /** Incrementally apply a batch of observations (pkCols..., tsCol,
    * attrCols...) to an existing SCD2 table: rebuild ONLY the touched
    * keys from (their current interval rows' valid_from observations +
    * the new batch) and pass every untouched key through unchanged.
    * Handles late/backfilled observations (an out-of-order ts splices
    * into the key's history exactly as a full rebuild would) and no-op
    * changes (same attributes as the neighboring observation collapse).
    * Shuffles: one semi + one anti join on the pk, one pk-keyed window
    * over the touched slice — all keyed on the dimension key.
    */
  def applyChanges(dim: DataFrame, changes: DataFrame, pkCols: Seq[String],
                   tsCol: String, attrCols: Seq[String]): DataFrame = {
    val touched = changes.select(pkCols.map(col): _*).distinct()
    val obs = dim.join(touched, pkCols, "left_semi")
      .select((pkCols.map(col) :+ col("valid_from").as(tsCol)) ++ attrCols.map(col): _*)
      .unionByName(changes.select((pkCols.map(col) :+ col(tsCol)) ++ attrCols.map(col): _*))
    val rebuilt = fromHistory(obs, pkCols, tsCol, attrCols)
    dim.join(touched, pkCols, "left_anti").unionByName(rebuilt)
  }
}
