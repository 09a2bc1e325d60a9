package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.analyses.SunriseSunset

/** Holdout-tuned sunrise/sunset optimizer (reference
  * `sunrise_sunset_estimation.py:184-335`): geometric-model recovery
  * on a synthetic year, the physical-plausibility guard, and the
  * real 193-day fixture. The threshold-grid stage itself is
  * hash-gated as q55.
  */
class SunriseSunsetSpec extends AnyFunSuite {
  lazy val spark: SparkSession = GraftSession.local("8")

  /** True solar-time sunrise/sunset at latitude `lat` for day-of-year
    * d (the reference's `sunset_hour_angle`, Cooper/Spencer
    * declination — `sunrise_sunset_estimation.py:381-397`).
    */
  private def riseSetTrue(doy: Int, lat: Double): (Double, Double) = {
    val b = math.toRadians((360.0 / 365.0) * (doy - 1))
    val delta = 0.006918 - 0.399912 * math.cos(b) + 0.070257 * math.sin(b) -
      0.006758 * math.cos(2 * b) + 0.000907 * math.sin(2 * b) -
      0.002697 * math.cos(3 * b) + 0.00148 * math.sin(3 * b)
    val ha = math.toDegrees(math.acos(-math.tan(math.toRadians(lat)) * math.tan(delta)))
    (12.0 - ha / 15.0, 12.0 + ha / 15.0)
  }

  private val lat = 37.5
  private val slots = 288

  /** One synthetic year at 5-min resolution: clear-sky sine between
    * the true geometric rise/set, plus deterministic night noise that
    * punishes too-low thresholds (their rough times ride the noise or
    * trip the first-sample guard).
    */
  private lazy val synthYear = {
    import spark.implicits._
    val rows = for {
      d <- 0 until 365
      s <- 0 until slots
    } yield {
      val (sr, ss) = riseSetTrue(d + 1, lat)
      val h = s * 24.0 / slots
      val sun =
        if (h > sr && h < ss) math.sin(math.Pi * (h - sr) / (ss - sr)) else 0.0
      val noise = 0.004 * (((d * slots + s) * 2654435761L) % 7).toDouble / 7.0
      val ts = java.sql.Timestamp.valueOf(
        java.time.LocalDate.of(2023, 1, 1).plusDays(d).atTime(0, 0).plusMinutes(s * 5L))
      (0L, ts, sun + noise)
    }
    rows.toDF("site", "ts", "power")
  }

  test("optimizer recovers the geometric rise/set curves within 15 minutes RMSE") {
    val est = SunriseSunset.estimates(spark, synthYear, "site", "ts", "power")
      .orderBy(col("day")).collect()
    assert(est.length == 365)
    // one threshold selected for the whole site, plausible fit
    val thIdxs = est.map(_.getInt(2)).distinct
    assert(thIdxs.length == 1, s"threshold not constant: ${thIdxs.mkString(",")}")
    assert(est.forall(_.getBoolean(5)), "fit not plausible")
    val ths = SunriseSunset.thresholdGrid()
    assert(ths.contains(est(0).getDouble(3)))
    // RMSE vs the geometric truth, both curves
    val (srSq, ssSq) = est.zipWithIndex.map { case (r, d) =>
      val (srT, ssT) = riseSetTrue(d + 1, lat)
      val e1 = r.getDouble(8) - srT
      val e2 = r.getDouble(9) - ssT
      (e1 * e1, e2 * e2)
    }.unzip
    val srRmse = math.sqrt(srSq.sum / 365)
    val ssRmse = math.sqrt(ssSq.sum / 365)
    assert(srRmse < 0.25, f"sunrise RMSE $srRmse%.3f h")
    assert(ssRmse < 0.25, f"sunset RMSE $ssRmse%.3f h")

    // estimated sun-up mask ≈ geometric truth at row grain
    val masked = SunriseSunset.sunupMask(synthYear, SunriseSunset.estimates(
      spark, synthYear, "site", "ts", "power"), "site", "ts")
      .select(col("ts"), col("sunup")).collect()
    var agree = 0
    masked.foreach { r =>
      val ldt = r.getTimestamp(0).toLocalDateTime
      val d = ldt.getDayOfYear
      val h = ldt.getHour + ldt.getMinute / 60.0
      val (srT, ssT) = riseSetTrue(d, lat)
      val trueUp = h >= srT && h < ssT
      if (trueUp == r.getBoolean(1)) agree += 1
    }
    val acc = agree.toDouble / masked.length
    assert(acc > 0.97, f"mask agreement $acc%.4f")
  }

  test("physical-plausibility guard: a constant daylight window is flagged non-physical") {
    // constant rise/set (range 0 < 15 min) → every threshold's fit
    // fails the range guard → ho_err pinned at 1e2, plausible=false
    // (reference `sunrise_sunset_estimation.py:249-264`, PVO ID#30121)
    val ths = SunriseSunset.thresholdGrid()
    val n = 365
    val t = Array.tabulate(n)(_.toDouble)
    val srGrid = Array.fill(ths.length)(Array.fill(n)(6.0))
    val ssGrid = Array.fill(ths.length)(Array.fill(n)(18.0))
    val fit = SunriseSunset.optimizeSite(srGrid, ssGrid, t, ths)
    assert(!fit.plausible)
    assert(fit.hoErr >= 1e2)
  }

  test("sun-up filter: implausible sites keep all rows instead of an unvalidated mask") {
    import spark.implicits._
    // constant daylight window every day → the 15-minute range guard
    // fails at every threshold → plausible=false; the filter must NOT
    // apply the unvalidated mask (which could drop the site wholesale)
    val rows = for { d <- 0 until 60; s <- 0 until 96 } yield {
      val h = s * 0.25
      val v = if (h >= 6.0 && h < 18.0) 1.0 else 0.0
      val ts = java.sql.Timestamp.valueOf(
        java.time.LocalDate.of(2024, 1, 1).plusDays(d).atTime(0, 0).plusMinutes(s * 15L))
      (5L, ts, v)
    }
    val df = rows.toDF("site", "ts", "power")
    val est = SunriseSunset.estimates(spark, df, "site", "ts", "power")
    assert(est.filter(col("plausible")).count() == 0, "constant window read as plausible")
    val kept = SunriseSunset.applySunupFilter(spark, df, "site", "ts", "power")
    assert(kept.count() == df.count(), "implausible site lost rows to an unvalidated mask")
  }

  test("optimized profiler recovers lat/lon from EoT-shifted clock-time data") {
    // the reference's optimized_sunrise_sunset.py path: tuned smoothed
    // rise/set → daylight + solar noon → Duffie inversion + EoT
    // correction. Clock-time synthetic at lat 37.5, lon 0, tz 0:
    // clock = solar − EoT (solar_to_clock with lon = 15·tz), Spencer
    // EoT matching functions.Solar.equationOfTimeMin.
    import spark.implicits._
    def eotMin(doy: Int): Double = {
      val b = 2.0 * math.Pi * (doy - 1) / 365.0
      229.18 * (0.000075 + 0.001868 * math.cos(b) - 0.032077 * math.sin(b) -
        0.014615 * math.cos(2 * b) - 0.04089 * math.sin(2 * b))
    }
    val rows = for {
      d <- 0 until 365
      s <- 0 until slots
    } yield {
      val (srS, ssS) = riseSetTrue(d + 1, lat)
      val sr = srS - eotMin(d + 1) / 60.0
      val ss = ssS - eotMin(d + 1) / 60.0
      val h = s * 24.0 / slots
      val sun = if (h > sr && h < ss) math.sin(math.Pi * (h - sr) / (ss - sr)) else 0.0
      val noise = 0.004 * (((d * slots + s) * 2654435761L) % 7).toDouble / 7.0
      val ts = java.sql.Timestamp.valueOf(
        java.time.LocalDate.of(2023, 1, 1).plusDays(d).atTime(0, 0).plusMinutes(s * 5L))
      (0L, ts, sun + noise)
    }
    val df = rows.toDF("site", "ts", "power")
    val loc = graft.analyses.Profiler
      .estimateLocationOptimized(spark, df, "site", "ts", "power")
      .collect()
    assert(loc.length == 1)
    val latEst = loc(0).getAs[Double]("lat_est")
    val lonEst = loc(0).getAs[Double]("lon_est")
    assert(math.abs(latEst - lat) < 1.5, f"lat $latEst%.2f vs $lat")
    assert(math.abs(lonEst - 0.0) < 1.5, f"lon $lonEst%.2f vs 0")
  }

  test("193-day fixture: selected threshold and estimates are physically sane") {
    val ts = graft.sources.Tables.csvTimeSeries(
      spark, "/root/reference/tests/fixtures/data_transforms/timeseries.csv")
      .select(col("ts"), col("ac_power_01").as("power"))
      .filter(col("power").isNotNull)
      .withColumn("site", lit(0L))
    val est = SunriseSunset.estimates(spark, ts, "site", "ts", "power").collect()
    assert(est.length == 193)
    assert(est.forall(_.getBoolean(5)), "fixture fit not plausible")

    // the FILLED-matrix re-estimate (reference pipeline stage 12):
    // same site through the densified grid — still plausible, and its
    // smoothed curves stay within an hour of the raw-path estimates
    val estF = new graft.DataHandler(ts, "site", "ts", "power")
      .sunriseSunsetEstimatesFilled().collect()
    assert(estF.length == 193)
    assert(estF.forall(_.getBoolean(5)), "filled-matrix fit not plausible")
    val rawByDay = est.map(r => r.getDate(1).toString -> ((r.getDouble(8), r.getDouble(9)))).toMap
    val drift = estF.flatMap { r =>
      rawByDay.get(r.getDate(1).toString).map { case (sr, ss) =>
        math.max(math.abs(r.getDouble(8) - sr), math.abs(r.getDouble(9) - ss))
      }
    }
    assert(drift.max < 1.0, f"filled-vs-raw estimate drift ${drift.max}%.2f h")
    val srMean = est.map(_.getDouble(8)).sum / est.length
    val ssMean = est.map(_.getDouble(9)).sum / est.length
    assert(srMean > 4.0 && srMean < 10.0, f"mean sunrise $srMean%.2f")
    assert(ssMean > 14.0 && ssMean < 22.0, f"mean sunset $ssMean%.2f")
    // measured-vs-estimated agreement at the selected threshold
    val resid = est.flatMap { r =>
      Seq(8 -> 6, 9 -> 7).flatMap { case (ei, mi) =>
        val m = r.getDouble(mi)
        if (m.isNaN) None else Some(math.abs(r.getDouble(ei) - m))
      }
    }
    val mae = resid.sum / resid.length
    assert(mae < 1.0, f"measured-vs-estimated MAE $mae%.3f h")
  }
}
