package graft.analyses

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.DataFrame

import graft.operators.{DayStats, Filling, SideJoin}

/** The tidy DataFrames behind the reference's most-used plot methods
  * (`data_handler.py:1627-2236`): the engine deliberately takes no
  * rendering dependency, so each `plot_*` entry point maps to ONE
  * table here holding exactly the values that plot draws — a user
  * pipes it to their plotting layer of choice.
  *
  * | reference method                  | table                    |
  * |-----------------------------------|--------------------------|
  * | `plot_heatmap` (:1627)            | [[heatmapTable]]         |
  * | `plot_daily_signals` (:1746)      | [[dailySignalsTable]]    |
  * | `plot_density_signal` (:1877)     | [[densitySignalTable]]   |
  * | `plot_clipping` (:2102)           | [[clippingTable]]        |
  * | `plot_daily_max_cdf/pdf`,
  * |   `plot_cdf_analysis` (:2154-2214)| [[dailyMaxCdfTable]]     |
  * | `plot_capacity_change_analysis`
  * |   (:2215)                         | [[capacityChangeTable]]  |
  *
  * Every table is a thin projection of an existing gated operator —
  * no new math, no new shuffles beyond what those operators already
  * pay. The heatmap grid (the one every user draws first) carries its
  * own cross-engine oracle gate (q92).
  */
object PlotTables {

  /** `plot_heatmap`'s (day × slot) matrix in tidy form: one row per
    * grid cell, both matrices as columns (`raw` is null off-sample;
    * `filled` is the cleaned/interpolated value). `day_index` is the
    * calendar offset from the site's first day — the matrix row the
    * reference indexes by.
    *
    * @return (site, day, day_index, slot, raw, filled)
    */
  def heatmapTable(
      df: DataFrame,
      site: String,
      tsCol: String,
      valueCol: String,
      slotsPerDay: Int = 48
  ): DataFrame = {
    val grid = Filling.filledDayGrid(
      df.filter(col(tsCol).isNotNull && col(valueCol).isNotNull),
      site, tsCol, valueCol, slotsPerDay)
    // first-day via a broadcast side aggregate, not a window over the
    // slot-grain grid (a per-site window would shuffle the whole grid
    // for one day-grain scalar)
    val firstDay = grid.groupBy(col("site")).agg(min(col("day")).as("__d0"))
    SideJoin.back(grid, firstDay, Seq("site"))
      .withColumn("day_index", datediff(col("day"), col("__d0")))
      .select(col("site"), col("day"), col("day_index"), col("slot"),
        col("raw"), col("filled"))
  }

  /** `plot_daily_signals`' raveled day slice: `num_days` consecutive
    * matrix columns starting at `start_day`, flattened to one
    * x-position per sample (the reference's `ravel=True` view).
    *
    * @return (site, day, slot, ravel_pos, value)
    */
  def dailySignalsTable(
      df: DataFrame,
      site: String,
      tsCol: String,
      valueCol: String,
      startDay: Int = 0,
      numDays: Int = 5,
      filled: Boolean = true,
      slotsPerDay: Int = 48
  ): DataFrame = {
    require(numDays > 0, s"numDays must be positive, got $numDays")
    heatmapTable(df, site, tsCol, valueCol, slotsPerDay)
      .filter(col("day_index") >= startDay && col("day_index") < startDay + numDays)
      .withColumn("ravel_pos",
        (col("day_index") - startDay) * slotsPerDay + col("slot"))
      .select(col("site"), col("day"), col("slot"), col("ravel_pos"),
        (if (filled) col("filled") else col("raw")).as("value"))
  }

  /** `plot_density_signal`'s per-day series: the daily data density
    * (fraction of samples above 2% of capacity — the q08 metric) with
    * the good-day flag the reference overlays (`flag="good"/"bad"`).
    *
    * @return (site, day, density, good_day)
    */
  def densitySignalTable(
      df: DataFrame,
      site: String,
      tsCol: String,
      valueCol: String,
      minCount: Long = 10L
  ): DataFrame =
    DayStats.dailyDensity(df, site, tsCol, valueCol)
      .join(
        DayStats.qualityFlags(df, site, tsCol, valueCol, minCount)
          .select(col(site), col("day"), col("good_day")),
        Seq(site, "day"), "left")
      .select(col(site).as("site"), col("day"), col("density"),
        coalesce(col("good_day"), lit(false)).as("good_day"))

  /** `plot_clipping`'s two per-day score series (clip1 = daily max /
    * site max; clip2 = fraction of normalized energy within 0.5% of
    * the daily max) plus the candidate-clipped flag the reference
    * marks in red (the q49 candidate rule `clip1 > 0.05 ∧ clip2 >
    * 0.1`; the site-level verdict stays q49's).
    *
    * @return (site, day, clip1, clip2, clip_candidate)
    */
  def clippingTable(
      df: DataFrame,
      site: String,
      tsCol: String,
      valueCol: String
  ): DataFrame =
    DayStats.clipStats(df, site, tsCol, valueCol)
      .select(col(site).as("site"), col("day"), col("clip1"), col("clip2"),
        (col("clip1") > 0.05 && col("clip2") > 0.1).as("clip_candidate"))

  /** `plot_daily_max_cdf` / `plot_daily_max_pdf` /
    * `plot_cdf_analysis`: each day's maximum with its empirical CDF
    * position (percent_rank over the site's days — the sorted curve
    * the CDF plot draws; a histogram of `daily_max` is the PDF).
    *
    * @return (site, day, daily_max, cdf)
    */
  def dailyMaxCdfTable(
      df: DataFrame,
      site: String,
      tsCol: String,
      valueCol: String
  ): DataFrame = {
    val w = Window.partitionBy(col(site)).orderBy(col("daily_max"))
    DayStats.dailyMax(df, site, tsCol, valueCol)
      .withColumn("cdf", percent_rank().over(w))
      .select(col(site).as("site"), col("day"), col("daily_max"), col("cdf"))
  }

  /** `plot_capacity_change_analysis`: the per-day capacity signal
    * (log of the daily max, the quantity the reference's capacity
    * clustering segments) with the q51 jump days and the resulting
    * segment label — consecutive days between detected capacity jumps
    * share a `segment`, the cluster id the reference colors by.
    *
    * @return (site, day, daily_max, log_daily_max, is_jump, segment)
    */
  def capacityChangeTable(
      df: DataFrame,
      site: String,
      tsCol: String,
      valueCol: String,
      jumpThreshold: Double = 0.1
  ): DataFrame = {
    val daily = df
      .groupBy(col(site), to_date(col(tsCol)).as("day"))
      .agg(max(col(valueCol)).as("daily_max"))
      .withColumn("ldm", log(greatest(col("daily_max"), lit(1e-9))))
    val w = Window.partitionBy(col(site)).orderBy(col("day"))
    // the q51 jump rule: 7-day-before vs 7-day-after log-level shift,
    // local-max suppression inside a ±3-day neighborhood
    val jumps = daily
      .withColumn("avg_before", avg(col("ldm")).over(w.rowsBetween(-7, -1)))
      .withColumn("avg_after", avg(col("ldm")).over(w.rowsBetween(0, 6)))
      .withColumn("jump_r", round(col("avg_after") - col("avg_before"), 6))
      .withColumn("nbr_max", max(abs(col("jump_r"))).over(w.rowsBetween(-3, 3)))
      .withColumn("is_jump",
        col("jump_r").isNotNull &&
          abs(col("jump_r")) > jumpThreshold && abs(col("jump_r")) === col("nbr_max"))
    jumps
      .withColumn("segment",
        sum(when(col("is_jump"), 1L).otherwise(0L))
          .over(w.rowsBetween(Window.unboundedPreceding, 0)))
      .select(col(site).as("site"), col("day"), col("daily_max"),
        col("ldm").as("log_daily_max"), col("is_jump"), col("segment"))
  }
}
