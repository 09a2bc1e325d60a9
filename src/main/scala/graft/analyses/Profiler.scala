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

  /** Per-site tilt/azimuth estimate (reference `tilt_azimuth_study.py`
    * via `run_curve_fit(select_function(latitude, None, None))`,
    * `angle_of_incidence/curve_fitting.py:12-37`): the scan reduces
    * to a bounded (day-of-year, hour) clear-sky envelope grid per
    * site, and the per-site Duffie-model Levenberg-Marquardt fit
    * ([[graft.solvers.Cluster.tiltAzimuthFit]]) runs on <= 366x24
    * points of state inside `mapGroups`. Azimuth is reported in the
    * Duffie convention (0 = south, east negative).
    *
    * Solar time: hours are equation-of-time corrected per day
    * (`Solar.equationOfTimeMin`, the reference's `clock_to_solar`
    * path) and centered on the site's rise/set-MIDPOINT noon — dawn
    * and dusk detection is horizon-driven, so the midpoint is
    * azimuth-unbiased, where an energy-center-of-mass origin shifts
    * WITH the azimuth and the fit then absorbs gamma into the time
    * axis (measured: gamma collapsed toward 0). The same rise/set
    * day table also supplies the default latitude (daylight-hours
    * inversion) so the default path costs one day-grain aggregation
    * plus the capacity and cell scans — not a separate
    * estimateLocation pass.
    *
    * @param latOverride optional (site, lat_est) table; defaults to
    *   the daylight-hours latitude from the shared rise/set table.
    *   The reference likewise feeds a precalculated latitude.
    * @return (<site>, lat_est, tilt_deg, azimuth_duffie_deg, n_cells)
    *   with NaN angles when the fit is degenerate (reference: np.nan
    *   on curve_fit failure).
    */
  def estimateOrientation(
      spark: org.apache.spark.sql.SparkSession,
      df: DataFrame,
      site: String,
      tsCol: String,
      valueCol: String,
      latOverride: Option[DataFrame] = None
  ): DataFrame = {
    import spark.implicits._
    import graft.operators.{DayStats, SideJoin}
    val eotH = Solar.equationOfTimeMin(dayofyear(to_date(col(tsCol)))) / lit(60.0)
    // one day-grain rise/set table feeds BOTH the solar-noon origin
    // (EoT-corrected midpoint median) and the default latitude
    val rs = DayStats.riseSetRough(df, site, tsCol, valueCol, 0.01)
      .withColumn("__eot_h",
        Solar.equationOfTimeMin(dayofyear(col("day"))) / lit(60.0))
    val noon = rs.groupBy(col(site)).agg(
      percentile((col("sunrise_h") + col("sunset_h")) / 2.0 + col("__eot_h"), lit(0.5))
        .as("__noon"))
    val lat = latOverride.getOrElse {
      val declRad = Solar.declinationDeg(dayofyear(col("day"))) * lit(DegToRad)
      rs.withColumn("__lat_day",
        atan(-cos(lit(7.5) * col("daylight_h") * lit(DegToRad)) / tan(declRad)) * lit(RadToDeg))
        .groupBy(col(site))
        .agg(percentile(col("__lat_day"), lit(0.5)).as("lat_est"))
    }
    val cap = df.groupBy(col(site))
      .agg(percentile(col(valueCol), lit(0.99)).as("__cap"))
    val h = TimeAxis.hourOfDay(col(tsCol)) + eotH
    val cells = SideJoin.back(SideJoin.back(df, cap, Seq(site)), noon, Seq(site))
      .select(
        col(site).cast("string").as("__site"),
        dayofyear(to_date(col(tsCol))).as("doy"),
        floor(h).cast("int").as("hslot"),
        (col(valueCol) / col("__cap")).as("np"),
        col("__noon").as("noon"))
      .filter(col("np") > 0.2)
      .groupBy(col("__site"), col("doy"), col("hslot"))
      .agg(max(col("np")).as("ct"), first(col("noon")).as("noon"))
    val withLat = cells
      .join(broadcast(lat.select(col(site).cast("string").as("__site"), col("lat_est"))),
        Seq("__site"))
      .select(col("__site"), col("doy"), col("hslot"), col("ct"), col("noon"), col("lat_est"))
      .as[(String, Int, Int, Double, Double, Double)]
    val fitted = withLat.groupByKey(_._1)
      .mapGroups { (siteId: String, it: Iterator[(String, Int, Int, Double, Double, Double)]) =>
        val pts = it.toArray
        val latDeg = pts(0)._6
        val noonH = pts(0)._5
        val delta = pts.map(p => math.toRadians(
          23.45 * math.sin(2 * math.Pi * (p._2 + 284.0) / 365.0)))
        val omega = pts.map(p => math.toRadians(15.0 * (p._3 + 0.5 - noonH)))
        // the observed envelope is only PROPORTIONAL to cos(theta)
        // (p99 capacity normalization, calibration); max(cos theta)
        // over a year is ~1 for any sane orientation, so normalize by
        // the max cell
        val ctMax = pts.map(_._4).max
        val ct = pts.map(_._4 / ctMax)
        val (b, g) = graft.solvers.Cluster.tiltAzimuthFit(
          delta, omega, ct, math.toRadians(latDeg))
        (siteId, latDeg, math.toDegrees(b), math.toDegrees(g), pts.length)
      }
      .toDF(site, "lat_est", "tilt_deg", "azimuth_duffie_deg", "n_cells")
    fitted
  }
}
