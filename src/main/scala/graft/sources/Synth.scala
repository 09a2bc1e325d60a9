package graft.sources

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Deterministic synthetic PV fleet generator (semantics of the
  * reference's `model_soiling.py:18-232` validation simulator):
  * seasonal clear-sky envelope × soiling sawtooth × linear
  * degradation + pseudo-noise, on a regular (site, day, slot) grid.
  *
  * Built from `spark.range` + scalar column expressions only — fully
  * codegen'd and scale-free (generate 10^12 rows by changing the
  * bounds; no driver-side data).
  */
object Synth {

  /** @param slotsPerDay measurements per day (e.g. 288 = 5-min)
    * @param capStep     site whose capacity halves mid-series (to
    *                    exercise capacity-change detection); -1 = none
    */
  def pvFleet(
      spark: SparkSession,
      nSites: Int,
      nDays: Int,
      slotsPerDay: Int,
      capStep: Int = -1
  ): DataFrame = {
    val total = nSites.toLong * nDays * slotsPerDay
    val base = spark.range(total)
    val ids = base
      .withColumn("site", (col("id") / (nDays.toLong * slotsPerDay)).cast("long"))
      .withColumn("day", ((col("id") / slotsPerDay) % nDays).cast("long"))
      .withColumn("slot", (col("id") % slotsPerDay).cast("int"))
    val h = col("slot").cast("double") * 24.0 / slotsPerDay
    val daylight = greatest(lit(0.0), sin(lit(math.Pi) * (h - 6.0) / 12.0))
    val seasonal = lit(1.0) + lit(0.25) * sin(lit(2.0 * math.Pi) * col("day") / 365.2425)
    val degradation = lit(1.0) - lit(0.00005) * col("day")
    val soiling = lit(1.0) - lit(0.1) * (pmod(col("day"), lit(30)).cast("double") / 30.0)
    val capacity = when(lit(capStep) >= 0 && col("site") === capStep && col("day") >= nDays / 2, 5.0)
      .otherwise(10.0)
    // deterministic pseudo-noise in [-0.05, 0.05]: sin-hash of the row id
    val noise = sin(col("id").cast("double") * 12.9898) * 0.05
    val power = capacity * daylight * seasonal * degradation * soiling * (lit(1.0) + noise)
    ids
      .withColumn("ts", timestamp_seconds(lit(1704067200L) + col("day") * 86400 + col("slot") * (86400 / slotsPerDay)))
      .withColumn("power", greatest(lit(0.0), power))
      .select(col("site"), col("ts"), col("day"), col("slot"), col("power"))
  }

  /** Physically-grounded fleet with KNOWN per-site geometry — the
    * ground-truth substrate for validating the system profiler
    * (reference `ground_truth_estimator.py` derives truth from site
    * KML; here the truth IS the generator parameter): power =
    * capacity · max(0, cosθ) with Duffie & Beckman eq. 1.6.2
    * ([[graft.solvers.Cluster.costhetaDuffie]]'s column twin), solar
    * time = UTC clock hour + 4 min/° longitude + equation of time, δ
    * Cooper's formula. Same spark.range + scalar-expression shape as
    * [[pvFleet]]: codegen'd, scale-free, no driver data.
    *
    * @param sites (siteId, latDeg, lonDeg, tiltDeg, azimuthDuffieDeg)
    * @return (site, ts, day, slot, power) plus a `truth` frame via
    *   [[pvSitesTruth]]
    */
  def pvSites(
      spark: SparkSession,
      sites: Seq[(Long, Double, Double, Double, Double)],
      nDays: Int,
      slotsPerDay: Int,
      utcOffsetHours: Double = 0.0
  ): DataFrame = {
    require(sites.nonEmpty, "pvSites needs at least one site")
    require(86400 % slotsPerDay == 0,
      s"slotsPerDay must divide 86400 (got $slotsPerDay) — an integer slot stride that " +
        "drops the day's tail would desync the stamped times from the solar clock")
    val nSites = sites.length
    val total = nSites.toLong * nDays * slotsPerDay
    val base = spark.range(total)
      .withColumn("__ix", (col("id") / (nDays.toLong * slotsPerDay)).cast("int"))
      .withColumn("day", ((col("id") / slotsPerDay) % nDays).cast("long"))
      .withColumn("slot", (col("id") % slotsPerDay).cast("int"))
    val truth = pvSitesTruth(spark, sites)
      .withColumn("__ix", row_number().over(
        org.apache.spark.sql.expressions.Window.orderBy(col("site"))) - 1)
    val withGeo = base.join(broadcast(truth), Seq("__ix"))
    val doy = col("day") + 1.0 // generator day 0 = Jan 1
    val deltaRad = radians(lit(23.45) * sin(lit(2.0 * math.Pi) * (doy + 284.0) / 365.0))
    val clockH = col("slot").cast("double") * 24.0 / slotsPerDay
    // timestamps are LOCAL STANDARD TIME at utcOffsetHours (0 = UTC
    // stamps): solar hour = clock − offset + 4 min/deg longitude + EoT
    // (same Spencer EoT the profiler inverts, so truth and estimate
    // share one time model). Keeping the solar day inside the stamped
    // date is the caller's job — pick an offset near lon/15, exactly
    // like real loggers stamp local standard time.
    val eotMin = graft.functions.Solar.equationOfTimeMin(doy)
    val solarH = clockH - utcOffsetHours + col("lon_deg") * 4.0 / 60.0 + eotMin / 60.0
    val omegaRad = radians(lit(15.0) * (solarH - 12.0))
    val phi = radians(col("lat_deg"))
    val beta = radians(col("tilt_deg"))
    val gamma = radians(col("az_deg"))
    val costheta =
      sin(deltaRad) * sin(phi) * cos(beta) -
        sin(deltaRad) * cos(phi) * sin(beta) * cos(gamma) +
        cos(deltaRad) * cos(phi) * cos(beta) * cos(omegaRad) +
        cos(deltaRad) * sin(phi) * sin(beta) * cos(gamma) * cos(omegaRad) +
        cos(deltaRad) * sin(beta) * sin(gamma) * sin(omegaRad)
    // horizon mask: panel output needs the SUN up (zenith cosine > 0),
    // not just a positive panel-plane incidence
    val coszen = sin(deltaRad) * sin(phi) + cos(deltaRad) * cos(phi) * cos(omegaRad)
    // beam + diffuse (15% weight, sky-view factor (1+cos beta)/2):
    // real panels produce from diffuse light across the WHOLE daylight
    // window, which is what makes sunrise/sunset estimable from power
    // at all — a beam-only signal starts at panel-plane incidence, not
    // at dawn, and would bias every daylight-based inversion. The
    // sqrt(cos zenith) shape mimics the STEEP twilight ramp of real
    // global irradiance (GHI reaches ~10% of its midday value within
    // ~30 min of sunrise; a linear-in-coszen model dawdles for hours
    // and no threshold detector, reference or ours, would see dawn)
    val beam = greatest(lit(0.0), costheta)
    val diffuse = lit(0.15) * sqrt(greatest(lit(0.0), coszen)) * (lit(1.0) + cos(beta)) / 2.0
    val power = when(coszen > 0.0, lit(10.0) * (lit(0.85) * beam + diffuse)).otherwise(0.0)
    withGeo
      .withColumn("ts", timestamp_seconds(lit(1704067200L) + col("day") * 86400 + col("slot") * (86400 / slotsPerDay)))
      .withColumn("power", power)
      .select(col("site"), col("ts"), col("day"), col("slot"), col("power"))
  }

  /** The ground-truth parameter table for [[pvSites]]:
    * (site, lat_deg, lon_deg, tilt_deg, az_deg).
    */
  def pvSitesTruth(
      spark: SparkSession,
      sites: Seq[(Long, Double, Double, Double, Double)]
  ): DataFrame = {
    import spark.implicits._
    sites.toDF("site", "lat_deg", "lon_deg", "tilt_deg", "az_deg")
  }
}
