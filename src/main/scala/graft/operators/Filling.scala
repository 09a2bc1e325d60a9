package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** Cleaning / filling operators (reference `solardatatools/data_filling.py`,
  * `data_handler.py:419-430`). All pure column expressions or windows —
  * fully codegen'd, no UDFs.
  */
object Filling {

  /** Values outside [minV, maxV] become null (reference
    * `data_handler.py:419-430`: clamp-to-NaN).
    */
  def clampToNull(v: Column, minV: Double, maxV: Double): Column =
    when(v.between(minV, maxV), v)

  /** Non-negative clamp (reference `data_filling.py:15`). */
  def nonNeg(v: Column): Column = greatest(v, lit(0.0))

  /** Zero out missing values outside the sun-up mask (reference
    * `data_filling.py:13-21`).
    */
  def zeroNight(v: Column, daytime: Column): Column =
    when(!daytime && v.isNull, lit(0.0)).otherwise(v)

  /** Linear interpolation of nulls within each key group, ordered by a
    * numeric axis (epoch seconds): the standard Spark window idiom —
    * last non-null before, first non-null after, weight by axis
    * distance. Ends stay at the nearest anchor (ffill/bfill), matching
    * `pandas.interpolate(limit_direction="both")` on interior+edge gaps.
    *
    * Reference: `data_filling.py:24-28` (per-day-column interpolate).
    * One window shuffle per call; no driver materialization.
    */
  def interpolateLinear(
      df: DataFrame,
      keys: Seq[String],
      axisCol: String,
      valueCol: String,
      outCol: String
  ): DataFrame = {
    val wAll = Window.partitionBy(keys.map(col): _*).orderBy(col(axisCol))
    val before = wAll.rowsBetween(Window.unboundedPreceding, 0)
    val after = wAll.rowsBetween(0, Window.unboundedFollowing)
    val prevV = last(col(valueCol), ignoreNulls = true).over(before)
    val nextV = first(col(valueCol), ignoreNulls = true).over(after)
    val prevX = last(when(col(valueCol).isNotNull, col(axisCol)), ignoreNulls = true).over(before)
    val nextX = first(when(col(valueCol).isNotNull, col(axisCol)), ignoreNulls = true).over(after)
    val t = (col(axisCol) - col("__px")).cast("double") / (col("__nx") - col("__px")).cast("double")
    df.withColumn("__pv", prevV)
      .withColumn("__nv", nextV)
      .withColumn("__px", prevX)
      .withColumn("__nx", nextX)
      .withColumn(
        outCol,
        when(col(valueCol).isNotNull, col(valueCol))
          .when(col("__pv").isNull, col("__nv"))
          .when(col("__nv").isNull, col("__pv"))
          .when(col("__nx") === col("__px"), col("__pv"))
          .otherwise(col("__pv") + t * (col("__nv") - col("__pv")))
      )
      .drop("__pv", "__nv", "__px", "__nx")
  }
}
