package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** Time-axis standardization operators.
  *
  * Re-expresses the reference's scan-side transform
  * (`solardatatools/time_axis_manipulation.py:103-252`: sort + dedup,
  * sampling-frequency inference, regular-grid nearest reindex) as
  * declarative DataFrame plans on a long `(site, ts, value)` layout.
  *
  * Scale notes: every operator here is a window over
  * `partitionBy(site)` or a `groupBy(site, ...)` — one shuffle on the
  * site key which all downstream per-site stages reuse. Nothing is
  * collected to the driver; per-site state is bounded.
  */
object TimeAxis {

  /** Epoch seconds (floored), matching `unix_timestamp` semantics. */
  def epochS(ts: Column): Column = unix_timestamp(ts)

  /** Seconds since local midnight (floored to whole seconds). */
  def secondsOfDay(ts: Column): Column =
    unix_timestamp(ts) - unix_timestamp(date_trunc("day", ts))

  /** Fractional hour of day in [0, 24). */
  def hourOfDay(ts: Column): Column = secondsOfDay(ts) / lit(3600.0)

  /** Sort + dedup timestamps per key, keep-first by `tieBreak`
    * (reference: `time_axis_manipulation.py:59-61`).
    */
  def sortDedup(df: DataFrame, keys: Seq[String], tsCol: String, tieBreak: String): DataFrame = {
    val w = Window.partitionBy((keys :+ tsCol).map(col): _*).orderBy(col(tieBreak))
    df.withColumn("__rn", row_number().over(w)).filter(col("__rn") === 1).drop("__rn")
  }

  /** Per-key consecutive timestamp deltas in whole seconds. Adds `dt_s`
    * (null on each key's first row).
    */
  def withDeltas(df: DataFrame, keys: Seq[String], tsCol: String): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(col(tsCol))
    df.withColumn("dt_s", epochS(col(tsCol)) - lag(epochS(col(tsCol)), 1).over(w))
  }

  /** Sampling-frequency inference: modal consecutive delta rounded to
    * the nearest 10 s (reference: `time_axis_manipulation.py:193-231`).
    * Tie-break: higher count wins, then smaller delta — deterministic.
    * Returns one row per key: (keys..., freq_s).
    */
  def inferFrequency(df: DataFrame, keys: Seq[String], tsCol: String): DataFrame = {
    val rounded = withDeltas(df, keys, tsCol)
      .filter(col("dt_s").isNotNull)
      .withColumn("dt_r", (round(col("dt_s") / 10.0) * 10).cast("long"))
    val counts = rounded.groupBy((keys :+ "dt_r").map(col): _*).agg(count(lit(1)).as("cnt"))
    val w = Window
      .partitionBy(keys.map(col): _*)
      .orderBy(col("cnt").desc, col("dt_r").asc)
    counts
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .select(keys.map(col) :+ col("dt_r").as("freq_s"): _*)
  }

  /** Bucketed as-of join: snap each observation to the nearest point of
    * a regular `gridS`-second grid, keeping at most one row per grid
    * stamp (the nearest; ties by `tieBreak` ascending).
    *
    * This is the reference's nearest-reindex
    * (`time_axis_manipulation.py:233-251`) re-expressed so Catalyst
    * runs an equi-shuffle + window instead of a generic non-equi join:
    * `grid_epoch = floor((epoch + gridS/2) / gridS) * gridS` turns
    * "nearest grid point" into an equi-key, and a `row_number` window
    * keeps the closest row. At 100 TB this is one hash shuffle on
    * `(keys, grid_epoch)` — no range-join blowup.
    *
    * Adds columns `grid_epoch` (long) and keeps the nearest source row.
    */
  def snapToGrid(
      df: DataFrame,
      keys: Seq[String],
      tsCol: String,
      gridS: Long,
      tieBreak: String
  ): DataFrame = {
    val e = epochS(col(tsCol))
    val withGrid = df
      .withColumn("__e", e)
      .withColumn("grid_epoch", (floor((col("__e") + lit(gridS / 2)) / lit(gridS)) * gridS).cast("long"))
      .withColumn("__dist", abs(col("__e") - col("grid_epoch")))
    val w = Window
      .partitionBy((keys :+ "grid_epoch").map(col): _*)
      .orderBy(col("__dist").asc, col(tieBreak).asc)
    withGrid
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn", "__dist", "__e")
  }

  /** Derive the `(day, slot)` grain of the reference's 2-D power matrix
    * (`matrix_embedding.py:27-67`) without materializing any matrix:
    * `day = to_date(ts)`, `slot = secondsOfDay / freqS`.
    */
  def withDaySlot(df: DataFrame, tsCol: String, freqS: Long): DataFrame =
    df.withColumn("day", to_date(col(tsCol)))
      .withColumn("slot", (secondsOfDay(col(tsCol)) / freqS).cast("int"))

  /** Circular roll of slots within a day (time-shift / TZ correction,
    * reference `algorithms/time_shifts.py:345-361`): pure projection.
    */
  def rollSlot(slot: Column, shift: Column, slotsPerDay: Int): Column =
    pmod(slot + shift, lit(slotsPerDay))

  /** Gross timezone-offset detection (reference
    * `time_axis_manipulation.py:141-192`): average-day profile's energy
    * center of mass; offset = round(12 - CoM-hour). One row per key.
    */
  def grossTzOffsetHours(df: DataFrame, keys: Seq[String], tsCol: String, valueCol: String): DataFrame = {
    val h = hourOfDay(col(tsCol))
    // try_divide: a site with zero total signal yields NULL instead of
    // an ANSI DIVIDE_BY_ZERO error killing the whole job.
    df.groupBy(keys.map(col): _*)
      .agg(try_divide(sum(h * col(valueCol)), sum(col(valueCol))).as("com_hour"))
      .withColumn("tz_offset_h", round(lit(12.0) - col("com_hour")).cast("int"))
  }
}
