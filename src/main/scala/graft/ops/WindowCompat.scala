package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Window-frame parity helpers for frame types Spark's engine lacks.
  *
  * GROUPS frames (SQL:2011; reference supports them through DataFusion's
  * window machinery, `datafusion/physical-expr/src/window/window_frame`)
  * count frame distance in PEER GROUPS — runs of order-key ties — rather
  * than rows or order-key values. Spark implements only ROWS and RANGE,
  * but a GROUPS frame is exactly a RANGE frame measured on the group
  * INDEX: dense_rank() numbers each peer group consecutively, so
  *
  *   agg OVER (... ORDER BY k GROUPS BETWEEN p PRECEDING AND f FOLLOWING)
  *     == agg OVER (... ORDER BY dense_rank RANGE BETWEEN p AND f)
  *
  * Both windows share the partitioning and sort order, so Catalyst plans
  * ONE exchange and ONE sort; the second Window operator just re-walks
  * the sorted partition.
  */
object WindowCompat {

  /** Append `agg` evaluated over a GROUPS frame of [`groupsBefore`,
    * `groupsAfter`] peer groups around each row's group, as column
    * `outName`. */
  def withGroupsFrameAgg(df: DataFrame, partitionBy: Seq[Column], orderBy: Column,
                         agg: Column, groupsBefore: Long, groupsAfter: Long,
                         outName: String): DataFrame = {
    val byKey = Window.partitionBy(partitionBy: _*).orderBy(orderBy)
    val byGroup = Window.partitionBy(partitionBy: _*).orderBy(col("__grp"))
      .rangeBetween(-groupsBefore, groupsAfter)
    df.withColumn("__grp", dense_rank().over(byKey))
      .withColumn(outName, agg.over(byGroup))
      .drop("__grp")
  }
}
