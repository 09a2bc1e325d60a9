package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.analyses.Profiler
import graft.sources.Synth

/** Fleet-wide estimate-vs-truth validation (the role of the
  * reference's `ground_truth_estimator.py`): generate a fleet with
  * KNOWN (lat, lon, tilt, azimuth) via the Duffie forward model
  * (`Synth.pvSites`), run the one-call `Profiler.estimateAll`, and
  * assert the `compareToTruth` error table recovers every parameter
  * within physical tolerance — plus the KML plane-normal conversion
  * arithmetic on known normals.
  */
class GroundTruthSpec extends AnyFunSuite {
  lazy val spark: SparkSession = GraftSession.local("8")

  // four sites in one timezone band (UTC-8, like a real fleet of
  // loggers stamping Pacific standard time) spanning latitudes,
  // in-band longitudes, flat-to-steep tilts, east/west azimuths
  private val sites = Seq(
    (0L, 37.0, -122.0, 20.0, 10.0),
    (1L, 33.0, -118.0, 30.0, -25.0),
    (2L, 45.0, -117.0, 15.0, 5.0),
    (3L, 25.0, -115.0, 35.0, 20.0)
  )
  private val tz = -8.0

  test("estimateAll recovers lat/lon/tilt/azimuth on a known-geometry fleet") {
    val df = Synth.pvSites(spark, sites, nDays = 365, slotsPerDay = 288, utcOffsetHours = tz)
    val est = Profiler.estimateAll(spark, df, "site", "ts", "power", gmtOffsetHours = tz)
    val truth = Synth.pvSitesTruth(spark, sites)
    val cmp = Profiler.compareToTruth(est, truth, "site").collect()
    assert(cmp.length == sites.length, s"lost sites: got ${cmp.length}")
    cmp.foreach { r =>
      val site = r.getAs[Long]("site")
      val latErr = math.abs(r.getAs[Double]("lat_err"))
      val lonErr = math.abs(r.getAs[Double]("lon_err"))
      val tiltErr = math.abs(r.getAs[Double]("tilt_err"))
      val azErr = math.abs(r.getAs[Double]("az_err"))
      // coordinates from day-grain medians: a few degrees; angles from
      // the hourly-envelope curve fit: looser but must identify the
      // panel (tilt within 10 deg, azimuth side + magnitude within 15)
      assert(latErr < 5.0, s"site $site lat_err $latErr")
      assert(lonErr < 5.0, s"site $site lon_err $lonErr")
      assert(tiltErr < 10.0, s"site $site tilt_err $tiltErr")
      assert(azErr < 15.0, s"site $site az_err $azErr")
    }
    // fleet-wide location error in km — the reference's own metric
    val meanKm = cmp.map(_.getAs[Double]("dist_km")).sum / cmp.length
    assert(meanKm < 600.0, s"fleet mean location error $meanKm km")
  }

  test("dayInterval knob restricts the orientation fit without touching location") {
    val df = Synth.pvSites(spark, sites.take(2), nDays = 365, slotsPerDay = 288, utcOffsetHours = tz)
    val full = Profiler.estimateAll(spark, df, "site", "ts", "power", gmtOffsetHours = tz)
    val windowed = Profiler.estimateAll(spark, df, "site", "ts", "power",
      dayInterval = Some((60, 300)), gmtOffsetHours = tz)
    val f = full.orderBy("site").collect()
    val w = windowed.orderBy("site").collect()
    // location columns identical (same day-grain pass)
    f.zip(w).foreach { case (a, b) =>
      assert(a.getAs[Double]("lat_est") == b.getAs[Double]("lat_est"))
      assert(a.getAs[Double]("lon_est") == b.getAs[Double]("lon_est"))
      assert(b.getAs[Int]("n_cells") < a.getAs[Int]("n_cells"),
        "day interval should shrink the orientation cell count")
      // the fit still identifies the panel on the restricted window
      assert(math.abs(b.getAs[Double]("tilt_deg") - a.getAs[Double]("tilt_deg")) < 10.0)
    }
  }

  test("clearDaysOnly knob keeps the fit green on an all-clear fleet") {
    val df = Synth.pvSites(spark, sites.take(1), nDays = 120, slotsPerDay = 288, utcOffsetHours = tz)
    val est = Profiler.estimateAll(spark, df, "site", "ts", "power",
      clearDaysOnly = true, clearSlotsPerDay = 288, gmtOffsetHours = tz)
    val row = est.collect().head
    assert(!row.getAs[Double]("tilt_deg").isNaN, "clear-day filter starved the fit")
  }

  test("plane-normal conversion matches the reference's tiltAz arithmetic") {
    import spark.implicits._
    // (x, y, z, expected tilt, expected azimuth) in the reference
    // frame: tilt = atan2(hypot(x, y), |z|); az = 90 - atan2(y, x),
    // folded into [-90, 90]; a downward normal flips all three axes
    val cases = Seq(
      (0.0, 0.0, 1.0, 0.0, 90.0),   // flat roof: atan2(0,0)=0 -> az 90
      (1.0, 0.0, 1.0, 45.0, 90.0),  // +x normal: 90 - 0
      (0.0, 1.0, 1.0, 45.0, 0.0),   // +y normal: 90 - 90
      (-1.0, 0.0, 1.0, 45.0, -90.0), // -x: 90 - 180, boundary stays
      (1.0, 0.0, -1.0, 45.0, -90.0)  // flipped to (-1, 0, 1)
    )
    val rows = cases.map(c => (c._1, c._2, c._3)).toDF("x", "y", "z")
      .withColumn("ta", Profiler.tiltAzimuthFromNormal(col("x"), col("y"), col("z")))
      .select(col("ta.tilt_deg"), col("ta.az_deg"))
      .collect()
    rows.zip(cases).foreach { case (r, c) =>
      assert(math.abs(r.getDouble(0) - c._4) < 1e-9, s"tilt for $c: ${r.getDouble(0)}")
      assert(math.abs(r.getDouble(1) - c._5) < 1e-9, s"az for $c: ${r.getDouble(1)}")
    }
  }
}
