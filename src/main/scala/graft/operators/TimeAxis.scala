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

  /** THE delta classifier shared by [[inferFrequency]] and
    * [[scanRateSegments]]'s default: 10 s rounding for ≥ 10 s deltas,
    * 1 s granularity (floored at 1) below. The sub-10 s tier matters:
    * plain 10 s rounding maps a 2 s scan rate (or duplicate
    * timestamps) to freq 0, which downstream grid/slot derivations
    * DIVIDE by — freq 0 silently nulls every grid stamp and collapses
    * the dataset to one row per key.
    */
  def roundedDelta(dt: Column): Column =
    when(dt < 10, greatest(round(dt), lit(1))).otherwise(round(dt / 10.0) * 10).cast("long")

  /** Sampling-frequency inference: modal consecutive delta via
    * [[roundedDelta]] (reference: `time_axis_manipulation.py:193-231`).
    * Tie-break: higher count wins, then smaller delta — deterministic.
    * Returns one row per key: (keys..., freq_s).
    */
  def inferFrequency(df: DataFrame, keys: Seq[String], tsCol: String): DataFrame = {
    val rounded = withDeltas(df, keys, tsCol)
      .filter(col("dt_s").isNotNull)
      .withColumn("dt_r", roundedDelta(col("dt_s")))
    val counts = rounded.groupBy((keys :+ "dt_r").map(col): _*).agg(count(lit(1)).as("cnt"))
    // modal Δt via min_by on the (-count, Δt) ordering struct — the
    // same deterministic tie-break as a (cnt desc, dt asc) row_number
    // window, in one aggregate instead of a second sort pass
    counts
      .groupBy(keys.map(col): _*)
      .agg(min_by(col("dt_r"), struct((-col("cnt")).as("nc"), col("dt_r").as("dt"))).as("freq_s"))
      .select(keys.map(col) :+ col("freq_s"): _*)
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

  /** Multi-scan-rate segment SPLITTING (SURVEY §7.5 #6 — the
    * reference, `time_axis_manipulation.py:208-231`, only warns on
    * multiple scan rates; the engine splits the series into maximal
    * constant-rate segments so each can be gridded at its own Δt).
    * Gaps-and-islands on the rounded consecutive delta: a new segment
    * starts wherever `dt_r` changes. Returns one row per delta row
    * with `dt_r` and `seg_id`; aggregate per (keys, seg_id) for
    * segment bounds. One shuffle on the site key; windows reuse it.
    */
  def scanRateSegments(
      df: DataFrame,
      keys: Seq[String],
      tsCol: String,
      classify: Column => Column = roundedDelta
  ): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(col(tsCol))
    val deltas = withDeltas(df, keys, tsCol)
      .filter(col("dt_s").isNotNull)
      .withColumn("dt_r", classify(col("dt_s")))
    deltas
      .withColumn("__new_seg", when(col("dt_r") <=> lag(col("dt_r"), 1).over(w), 0L).otherwise(1L))
      .withColumn("seg_id", sum(col("__new_seg")).over(w.rowsBetween(Window.unboundedPreceding, 0)))
      .drop("__new_seg")
  }

  /** Order-of-magnitude scan-rate classifier for irregular telemetry:
    * ≤1 min, ≤10 min, ≤1 h, else daily-scale.
    */
  def rateClass(dtS: Column): Column =
    when(dtS <= 60, 60L).when(dtS <= 600, 600L).when(dtS <= 3600, 3600L).otherwise(86400L)

  /** DST repair via tz-database localization (reference
    * `time_axis_manipulation.py:255-267`, `data_handler.py:842-863`):
    * interpret naive wall-clock stamps in `zone`, null out stamps that
    * are nonexistent (spring-forward gap) or ambiguous (fall-back
    * repeat) — the reference's `ambiguous="NaT", nonexistent="NaT"` —
    * and emit the instant re-expressed at a fixed standard offset, so
    * downstream day/slot math sees a DST-free clock.
    *
    * Detection is pure column arithmetic (no UDF):
    *  - nonexistent wall time ⇔ UTC round-trip does not reproduce it;
    *  - ambiguous wall time ⇔ the zone offset one hour later is one
    *    hour larger (the stamp falls in the repeated fall-back hour).
    * Handles the standard 1-hour DST transitions of the tz database.
    *
    * Adds: `ts_utc` (null where dropped), `ts_fixed` (wall clock at
    * `fixedOffsetHours`), `dst_dropped` (flag).
    */
  def fixDst(df: DataFrame, tsCol: String, zone: String, fixedOffsetHours: Int): DataFrame = {
    val ts = col(tsCol)
    val utc = to_utc_timestamp(ts, zone)
    val roundTrip = from_utc_timestamp(utc, zone)
    val offS = unix_timestamp(utc) - unix_timestamp(ts)
    val tsPlus1h = timestamp_seconds(unix_timestamp(ts) + 3600L)
    val offPlus1hS = unix_timestamp(to_utc_timestamp(tsPlus1h, zone)) - (unix_timestamp(ts) + 3600L)
    val nonexistent = unix_timestamp(roundTrip) =!= unix_timestamp(ts)
    val ambiguous = (offPlus1hS - offS) === 3600L
    val dropped = nonexistent || ambiguous
    df.withColumn("dst_dropped", dropped)
      .withColumn("ts_utc", when(dropped, lit(null).cast("timestamp")).otherwise(utc))
      .withColumn("ts_fixed", timestamp_seconds(unix_timestamp(col("ts_utc")) + lit(fixedOffsetHours * 3600L)))
  }

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
