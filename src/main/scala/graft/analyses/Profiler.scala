package graft.analyses

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.Solar
import graft.operators.TimeAxis

/** System-profiler estimates from the power signal alone (reference
  * `pvsystemprofiler/`: `longitude_study.py`, `latitude_study.py`) —
  * per-day daylight-duration and solar-noon signals turned into
  * latitude/longitude medians.
  *
  * One aggregation over the raw table per call: the day-grain signal
  * table is the only shuffle, and the latitude/longitude day
  * estimates are scalar column expressions on it.
  */
object Profiler {

  private val DegToRad = 0.017453292519943295
  private val RadToDeg = 57.29577951308232

  /** Per-site location estimate: daylight hours → latitude (Duffie
    * hour-angle inversion), energy center-of-mass + equation of time
    * → longitude; per-site medians over the day estimates.
    *
    * @return (<site>, lat_est, lon_est, n_days)
    */
  // (the q37 oracle-gated path — rough rise/set from the 5% threshold)
  def estimateLocation(df: DataFrame, site: String, tsCol: String, valueCol: String): DataFrame = {
    val siteMax = df.groupBy(col(site)).agg(round(max(col(valueCol)) * 0.05, 6).as("thr"))
    val h = TimeAxis.hourOfDay(col(tsCol))
    val daily = df
      .join(broadcast(siteMax), Seq(site))
      .groupBy(col(site), to_date(col(tsCol)).as("day"))
      .agg(
        (max(when(col(valueCol) > col("thr"), h)) - min(when(col(valueCol) > col("thr"), h))).as("dl_h"),
        // CoM from rounded sums (see the q11 note in SparkEntry) +
        // try_divide dead-day guard
        round(sum(TimeAxis.secondsOfDay(col(tsCol)) * col(valueCol)), 2).as("num_sv"),
        round(sum(col(valueCol)), 2).as("sum_v")
      )
      .withColumn("com_hour", try_divide(col("num_sv") / 3600.0, col("sum_v")))
    val doy = dayofyear(col("day"))
    val declRad = Solar.declinationDeg(doy) * lit(DegToRad)
    val eot = Solar.equationOfTimeMin(doy)
    daily
      .withColumn("lat_day", atan(-cos(lit(7.5) * col("dl_h") * lit(DegToRad)) / tan(declRad)) * lit(RadToDeg))
      .withColumn("lon_day", lit(-15.0) * (col("com_hour") - lit(12.0) + eot / lit(60.0)))
      .groupBy(col(site))
      .agg(
        round(percentile(col("lat_day"), lit(0.5)), 6).as("lat_est"),
        round(percentile(col("lon_day"), lit(0.5)), 6).as("lon_est"),
        count(lit(1)).as("n_days")
      )
  }

  /** [[estimateLocation]] fed by the holdout-TUNED smoothed
    * sunrise/sunset estimates instead of the rough 5%-threshold
    * times — the reference's `optimized_sunrise_sunset.py` path
    * (`get_optimized_sunrise_sunset` → latitude/longitude studies):
    * daylight = set − rise of the smoothed curves, solar noon =
    * their midpoint, then the identical Duffie inversion and
    * equation-of-time correction. On noisy multi-year sites the
    * smoothed curves cut the day-estimate variance the rough times
    * carry — which is exactly why the reference tunes the threshold
    * before profiling. Solver-path (quantile fits) → spec-gated
    * (SunriseSunsetSpec recovers a known lat/lon through it); q37
    * stays the oracle-gated relational analog.
    */
  def estimateLocationOptimized(
      spark: org.apache.spark.sql.SparkSession,
      df: DataFrame,
      site: String,
      tsCol: String,
      valueCol: String,
      searchPts: Int = 21
  ): DataFrame = {
    val est = SunriseSunset.estimates(spark, df, site, tsCol, valueCol, searchPts)
    val doy = dayofyear(col("day"))
    val declRad = Solar.declinationDeg(doy) * lit(DegToRad)
    val eot = Solar.equationOfTimeMin(doy)
    est
      .filter(col("plausible") && !isnan(col("sunrise_est")) && !isnan(col("sunset_est")))
      .withColumn("dl_h", col("sunset_est") - col("sunrise_est"))
      .withColumn("noon_h", (col("sunrise_est") + col("sunset_est")) / 2.0)
      .withColumn("lat_day",
        atan(-cos(lit(7.5) * col("dl_h") * lit(DegToRad)) / tan(declRad)) * lit(RadToDeg))
      .withColumn("lon_day", lit(-15.0) * (col("noon_h") - lit(12.0) + eot / lit(60.0)))
      .groupBy(col(site))
      .agg(
        round(percentile(col("lat_day"), lit(0.5)), 6).as("lat_est"),
        round(percentile(col("lon_day"), lit(0.5)), 6).as("lon_est"),
        first(col("threshold")).as("threshold"),
        count(lit(1)).as("n_days")
      )
  }
}
