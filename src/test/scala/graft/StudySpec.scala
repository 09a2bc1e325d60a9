package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.analyses.{Profiler, Study}
import graft.sources.Synth

/** Config-sweep study validation on the known-geometry Duffie fleet
  * (the role of the reference's `latitude_study.py` /
  * `longitude_study.py` result tables): the sweep must cover the full
  * config cross-product, agree with the ground truth somewhere in the
  * sweep at least as well as the single-config estimator (the point
  * of running a study), and expose residuals per config.
  */
class StudySpec extends AnyFunSuite {
  lazy val spark: SparkSession = GraftSession.local("8")

  private val sites = Seq(
    (0L, 37.0, -122.0, 20.0, 10.0),
    (1L, 33.0, -118.0, 30.0, -25.0)
  )
  private val tz = -8.0

  private lazy val fleet =
    Synth.pvSites(spark, sites, nDays = 365, slotsPerDay = 288, utcOffsetHours = tz)
  private lazy val truth = Synth.pvSitesTruth(spark, sites)

  test("latitudeStudy covers the config cross-product and the best config beats the single-config estimate") {
    val study = Study.latitudeStudy(spark, fleet, "site", "ts", "power",
      includeFilled = true, filledSlotsPerDay = 96, clearSlotsPerDay = 96)
    val rows = Study.withResidual(
      study, truth.select(col("site"), col("lat_deg")), "site", "latitude", "lat_deg")
      .collect()
    // 2 matrices × 2 daylight methods × 2 declinations × 3 selections
    assert(rows.length == sites.length * 24, s"got ${rows.length} config rows")
    val labels = rows.map(r => (
      r.getAs[String]("data_matrix"), r.getAs[String]("daylight_method"),
      r.getAs[String]("delta_method"), r.getAs[String]("day_selection"))).distinct
    assert(labels.length == 24, s"distinct configs ${labels.length}")

    val single = Profiler.estimateLocation(fleet, "site", "ts", "power", gmtOffsetHours = tz)
      .collect().map(r => r.getAs[Long]("site") -> r.getAs[Double]("lat_est")).toMap
    sites.foreach { case (id, latTrue, _, _, _) =>
      val errs = rows.filter(_.getAs[Long]("site") == id)
        .map(r => r.getAs[Double]("residual"))
        .filterNot(v => v == null || v.isNaN)
        .map(math.abs)
      assert(errs.nonEmpty, s"site $id: no non-null config estimates")
      val singleErr = math.abs(latTrue - single(id))
      // the sweep's whole point (latitude_study.py:193-195): its best
      // config must do at least as well as the one-config default
      assert(errs.min <= singleErr + 1e-9,
        s"site $id best-config err ${errs.min} vs single-config $singleErr")
      assert(errs.min < 5.0, s"site $id best-config err ${errs.min}")
    }
  }

  test("longitudeStudy recovers longitude and orders configs by residual") {
    val study = Study.longitudeStudy(spark, fleet, "site", "ts", "power",
      gmtOffsetHours = tz, includeFilled = true, filledSlotsPerDay = 96,
      clearSlotsPerDay = 96)
    val rows = Study.withResidual(
      study, truth.select(col("site"), col("lon_deg")), "site", "longitude", "lon_deg")
      .collect()
    // 2 matrices × 2 noons × 2 EoTs × 3 selections × 4 estimators
    assert(rows.length == sites.length * 96, s"got ${rows.length} config rows")
    // fit_l1 and calculated share the median argmin (linear residuals)
    val byKey = rows.groupBy(r => (r.getAs[Long]("site"), r.getAs[String]("data_matrix"),
      r.getAs[String]("solar_noon_method"), r.getAs[String]("eot_calculation"),
      r.getAs[String]("day_selection")))
    byKey.values.foreach { grp =>
      val byEst = grp.map(r => r.getAs[String]("estimator") ->
        Option(r.getAs[java.lang.Double]("longitude")).map(_.toDouble)).toMap
      assert(byEst("fit_l1") == byEst("calculated"), "fit_l1 must equal calculated")
      // on a clean fleet the Huber estimate sits with the median/mean
      for (m <- byEst("fit_l1"); h <- byEst("fit_huber")) {
        assert(math.abs(m - h) < 5.0, s"huber $h far from median $m")
      }
    }

    val single = Profiler.estimateLocation(fleet, "site", "ts", "power", gmtOffsetHours = tz)
      .collect().map(r => r.getAs[Long]("site") -> r.getAs[Double]("lon_est")).toMap
    sites.foreach { case (id, _, lonTrue, _, _) =>
      val errs = rows.filter(_.getAs[Long]("site") == id)
        .map(r => r.getAs[Double]("residual"))
        .filterNot(v => v == null || v.isNaN)
        .map(math.abs)
      assert(errs.nonEmpty, s"site $id: no non-null config estimates")
      val singleErr = math.abs(lonTrue - single(id))
      assert(errs.min <= singleErr + 1e-9,
        s"site $id best-config err ${errs.min} vs single-config $singleErr")
      assert(errs.min < 5.0, s"site $id best-config err ${errs.min}")
    }
  }

  test("tiltAzimuthStudy covers season × declination × threshold and recovers orientation") {
    val study = Study.tiltAzimuthStudy(spark, fleet, "site", "ts", "power",
      daytimeThresholds = Seq(0.1, 0.2))
    val rows = study.collect()
    // full_year + no_winter + 3 in-year seasons + wrapping winter all
    // select cells on a 365-day fleet; × 2 declinations × 2 thresholds
    val byCfg = rows.groupBy(r => (r.getAs[String]("day_range"),
      r.getAs[String]("delta_method"), r.getAs[Double]("daytime_threshold")))
    assert(byCfg.size == 6 * 2 * 2, s"got ${byCfg.size} configs")
    // every config row carries a real fit on this clean fleet
    val fy = rows.filter(r => r.getAs[String]("day_range") == "full_year"
      && r.getAs[String]("delta_method") == "cooper"
      && r.getAs[Double]("daytime_threshold") == 0.2)
    assert(fy.length == sites.length)
    // the full-year/cooper/0.2 config IS estimateOrientation's
    // configuration (same cells, same fit) — results must agree
    val single = Profiler.estimateOrientation(spark, fleet, "site", "ts", "power")
      .collect().map(r => r.getAs[String]("site") ->
        (r.getAs[Double]("tilt_deg"), r.getAs[Double]("azimuth_duffie_deg"))).toMap
    fy.foreach { r =>
      val (t0, a0) = single(r.getAs[String]("site"))
      assert(math.abs(r.getAs[Double]("tilt_deg") - t0) < 1e-9,
        s"tilt mismatch vs estimateOrientation")
      assert(math.abs(r.getAs[Double]("azimuth_duffie_deg") - a0) < 1e-9,
        s"azimuth mismatch vs estimateOrientation")
    }
    // orientation is recovered somewhere in the sweep per site (truth
    // tilt/az from the fleet definition)
    sites.foreach { case (id, _, _, tiltTrue, azTrue) =>
      val mine = rows.filter(_.getAs[String]("site") == id.toString)
      val best = mine.map(r => math.abs(r.getAs[Double]("tilt_deg") - tiltTrue)
        + math.abs(r.getAs[Double]("azimuth_duffie_deg") - azTrue)).min
      assert(best < 25.0, s"site $id best combined tilt+az err $best")
    }
    // the summer window must use fewer cells than the full year
    rows.filter(r => r.getAs[String]("day_range") == "summer").foreach { r =>
      val full = rows.find(x => x.getAs[String]("site") == r.getAs[String]("site")
        && x.getAs[String]("day_range") == "full_year"
        && x.getAs[String]("delta_method") == r.getAs[String]("delta_method")
        && x.getAs[Double]("daytime_threshold") == r.getAs[Double]("daytime_threshold")).get
      assert(r.getAs[Int]("n_cells") < full.getAs[Int]("n_cells"))
    }
  }

  test("tiltAzimuthStudy on the filled matrix recovers orientation too") {
    // the reference study's actual input (tilt_azimuth_study.py:97 is
    // the filled_data_matrix) — the filled-grid event twin must feed
    // the same fit and still recover the fleet's known geometry
    val study = Study.tiltAzimuthStudy(spark, fleet, "site", "ts", "power",
      dayRanges = Seq("full_year" -> None),
      deltaMethods = Seq("cooper"),
      useFilled = true, filledSlotsPerDay = 96)
    val rows = study.collect()
    assert(rows.length == sites.length)
    sites.foreach { case (id, _, _, tiltTrue, azTrue) =>
      val r = rows.find(_.getAs[String]("site") == id.toString).get
      assert(math.abs(r.getAs[Double]("tilt_deg") - tiltTrue) < 12.0,
        s"site $id filled-matrix tilt ${r.getAs[Double]("tilt_deg")} vs $tiltTrue")
      assert(math.abs(r.getAs[Double]("azimuth_duffie_deg") - azTrue) < 15.0,
        s"site $id filled-matrix azimuth ${r.getAs[Double]("azimuth_duffie_deg")} vs $azTrue")
    }
  }

  test("optimized daylight methods join the sweep on both matrices when enabled") {
    val small = Synth.pvSites(spark, sites.take(1), nDays = 120, slotsPerDay = 288,
      utcOffsetHours = tz)
    val study = Study.latitudeStudy(spark, small, "site", "ts", "power",
      includeFilled = true, includeOptimized = true, clearSlotsPerDay = 96,
      filledSlotsPerDay = 96)
    val rows = study.collect()
    val byMethod = rows.groupBy(_.getAs[String]("daylight_method"))
    assert(byMethod.keySet == Set(
      "sunrise-sunset", "raw-daylight",
      "optimized-estimates", "optimized-measurements"),
      s"got ${byMethod.keySet}")
    // both optimizer outputs must exist on BOTH matrices (the
    // reference runs get_optimized_sunrise_sunset(fdm, rdm)) and
    // actually produce estimates, not nulls
    for (m <- Seq("optimized-estimates", "optimized-measurements")) {
      val all = byMethod(m).filter(_.getAs[String]("day_selection") == "all")
      assert(all.map(_.getAs[String]("data_matrix")).toSet == Set("raw", "filled"),
        s"$m missing a data matrix")
      assert(all.forall(r => !r.isNullAt(r.fieldIndex("latitude"))),
        s"$m configs produced null latitude")
    }
    // on clean synthetic data the fitted-curve and raw-measurement
    // daylights both invert to ~the true latitude
    val latTrue = sites.take(1).head._2
    for (r <- byMethod("optimized-estimates")
           if r.getAs[String]("day_selection") == "all") {
      assert(math.abs(r.getAs[Double]("latitude") - latTrue) < 8.0,
        s"optimized-estimates latitude ${r.getAs[Double]("latitude")} vs $latTrue")
    }
  }

  test("tiltAzimuthStudy's seasonal (x1, x2) threshold axis recovers orientation") {
    val study = Study.tiltAzimuthStudy(spark, fleet, "site", "ts", "power",
      dayRanges = Seq(("full_year", None)),
      deltaMethods = Seq("cooper"),
      thresholdQuantiles = Seq((0.9, 0.9), (0.5, 0.8)))
    val rows = study.collect()
    // config cross-product: 2 sites × 1 range × 1 delta × 2 (x1,x2)
    assert(rows.length == sites.length * 2, s"got ${rows.length} rows")
    val cfgs = rows.map(r => (r.getAs[Double]("x1"), r.getAs[Double]("x2"))).distinct
    assert(cfgs.toSet == Set((0.9, 0.9), (0.5, 0.8)), s"got ${cfgs.mkString(",")}")
    // the seasonal-threshold filter must still leave enough envelope
    // cells to recover the geometry on the clean fleet
    sites.foreach { case (id, _, _, tiltTrue, azTrue) =>
      val best = rows.filter(_.getAs[String]("site") == id.toString)
        .minBy(r => math.abs(r.getAs[Double]("tilt_deg") - tiltTrue))
      assert(math.abs(best.getAs[Double]("tilt_deg") - tiltTrue) < 12.0,
        s"site $id tilt ${best.getAs[Double]("tilt_deg")} vs $tiltTrue")
      assert(math.abs(best.getAs[Double]("azimuth_duffie_deg") - azTrue) < 20.0,
        s"site $id azimuth ${best.getAs[Double]("azimuth_duffie_deg")} vs $azTrue")
      assert(best.getAs[Int]("n_cells") > 50, "seasonal filter left too few cells")
    }
  }

  test("longitude study's optimized solar-noon axis spans both matrices and variants") {
    val small = Synth.pvSites(spark, sites.take(1), nDays = 120, slotsPerDay = 288,
      utcOffsetHours = tz)
    val study = Study.longitudeStudy(spark, small, "site", "ts", "power",
      gmtOffsetHours = tz, includeFilled = true, includeOptimized = true,
      estimators = Seq("calculated"), clearSlotsPerDay = 96, filledSlotsPerDay = 96)
    val rows = study.collect().filter(_.getAs[String]("day_selection") == "all")
    val byNoon = rows.groupBy(_.getAs[String]("solar_noon_method"))
    assert(Set("optimized-estimates", "optimized-measurements").subsetOf(byNoon.keySet),
      s"got ${byNoon.keySet}")
    for (m <- Seq("optimized-estimates", "optimized-measurements")) {
      assert(byNoon(m).map(_.getAs[String]("data_matrix")).toSet == Set("raw", "filled"),
        s"$m missing a data matrix")
    }
  }
}
