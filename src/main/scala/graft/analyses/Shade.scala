package graft.analyses

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Shade analysis (reference `algorithms/shade.py:351-410`,
  * simplified): on the dilated grain, a slot that sits persistently
  * below the site's clear-sky envelope at the same time-of-day marks
  * a shading window (tree/obstruction), as opposed to weather, which
  * is not time-of-day aligned.
  *
  * Fully relational: per (site, dil_slot) median and p90 across days
  * vs the per-slot envelope → shade fraction per slot + contiguous
  * shade windows. (The reference's PCA-basis 2-D decomposition is the
  * round-2 refinement; this captures its detection semantics.)
  */
object Shade {

  /** @return (site, dil_slot, med_v, env_v, shade_frac, shaded)
    *
    * The clear-sky envelope at a slot is the p90 of the slot's
    * *mirror across solar noon* (on the dilated grid, slot
    * `nBins−1−s`), or its own p90 if larger: persistent shade
    * depresses its own slot's statistics, but the day's profile is
    * near-symmetric, so the unshaded mirror restores the envelope —
    * which is what distinguishes an obstruction (time-of-day-locked,
    * asymmetric) from weather (symmetric in expectation).
    */
  def slotShade(dilated: DataFrame, shadeThreshold: Double = 0.25, nBins: Int = 100): DataFrame = {
    val perSlot = dilated
      .groupBy(col("site"), col("dil_slot"))
      .agg(
        percentile(col("dil_value"), lit(0.5)).as("med_v"),
        percentile(col("dil_value"), lit(0.9)).as("p90_v")
      )
    val mirror = perSlot.select(
      col("site"),
      (lit(nBins - 1) - col("dil_slot")).as("dil_slot"),
      col("p90_v").as("mirror_p90")
    )
    perSlot
      .join(mirror, Seq("site", "dil_slot"), "left")
      .withColumn("env_v", greatest(col("p90_v"), coalesce(col("mirror_p90"), col("p90_v"))))
      .withColumn(
        "shade_frac",
        greatest(lit(0.0), lit(1.0) - try_divide(col("med_v"), col("env_v")))
      )
      .withColumn("shaded", col("shade_frac") > shadeThreshold)
      .drop("p90_v", "mirror_p90")
  }

  /** Per-site shade summary: fraction of slots shaded and the longest
    * contiguous shaded window (gaps-and-islands over dil_slot).
    */
  def siteSummary(slotShade: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("site")).orderBy(col("dil_slot"))
    val runs = slotShade
      .withColumn("__chg", when(lag(col("shaded"), 1).over(w).isNull ||
        lag(col("shaded"), 1).over(w) =!= col("shaded"), 1).otherwise(0))
      .withColumn("__run", sum(col("__chg")).over(w.rowsBetween(Window.unboundedPreceding, 0)))
    val runLens = runs
      .filter(col("shaded"))
      .groupBy(col("site"), col("__run"))
      .agg(count(lit(1)).as("run_len"))
    val longest = runLens.groupBy(col("site")).agg(max(col("run_len")).as("longest_shade_run"))
    slotShade
      .groupBy(col("site"))
      .agg(avg(col("shaded").cast("double")).as("shaded_frac"))
      .join(longest, Seq("site"), "left")
      .na.fill(0L, Seq("longest_shade_run"))
  }
}
