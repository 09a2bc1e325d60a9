package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.analyses.{Pipeline, Profiler}
import graft.operators.{DayStats, Filling}
import graft.sources.Synth

/** The DataHandler facade is pure delegation: every method must equal
  * the operator it fronts, and report() must expose the reference's
  * summary fields with sane values on the synthetic fleet.
  */
class DataHandlerSpec extends AnyFunSuite {
  lazy val spark: SparkSession = GraftSession.local("4")

  private lazy val fleet = Synth.pvFleet(spark, nSites = 3, nDays = 40, slotsPerDay = 96)
    .select(col("site"), col("ts"), col("power"))
  private lazy val dh = new DataHandler(fleet, "site", "ts", "power")

  test("facade methods equal their operators") {
    assert(dh.capacityEstimate().collect().toSet ==
      DayStats.capacity(fleet, "site", "power").collect().toSet)
    assert(dh.getDensityScores().collect().toSet ==
      DayStats.dailyDensity(fleet, "site", "ts", "power").collect().toSet)
    assert(dh.makeFilledDataMatrix(96).count() ==
      Filling.filledDayGrid(fleet, "site", "ts", "power", 96).count())
    assert(dh.estimateLocation().collect().toSet ==
      Profiler.estimateLocation(fleet, "site", "ts", "power").collect().toSet)
    assert(dh.runPipeline().collect().map(_.site).sorted.toSeq ==
      Pipeline.run(spark, fleet, "site", "ts", "power").collect().map(_.site).sorted.toSeq)
  }

  test("runPipeline(estimateSunTimes=true) runs stage 3 end to end") {
    // the sun-up-filtered pipeline: every site still reports, no
    // stage errors, and the daytime restriction can only RAISE the
    // mean observed power versus the unfiltered run (nights dropped)
    val masked = dh.runPipeline(estimateSunTimes = true).collect().sortBy(_.site)
    assert(masked.length == 3)
    masked.foreach { r =>
      assert(r.errors.isEmpty, s"site ${r.site}: ${r.errors}")
      assert(r.nDays >= 39, s"site ${r.site} lost days: ${r.nDays}")
      assert(r.capacity > 0)
    }
    // on this clean synthetic the optimizer is plausible and the mask
    // keeps strictly fewer rows than the raw scan (nights exist)
    val filtered = graft.analyses.SunriseSunset
      .applySunupFilter(spark, fleet, "site", "ts", "power")
    assert(filtered.count() < fleet.count(), "mask filtered nothing")
    assert(filtered.count() > 0)
  }

  test("report() carries the reference's summary fields with sane values") {
    val rows = dh.report().collect()
    assert(rows.length == 3)
    rows.foreach { r =>
      assert(math.abs(r.getAs[Double]("length_years") - 40.0 / 365.2425) < 1e-3)
      assert(math.abs(r.getAs[Double]("sampling_minutes") - 15.0) < 1e-9)
      assert(r.getAs[Double]("capacity") > 5.0 && r.getAs[Double]("capacity") < 20.0)
      val q = r.getAs[Double]("quality_score")
      assert(q >= 0.0 && q <= 1.0)
    }
  }

  test("facade works with non-default column names") {
    val renamed = fleet.select(col("site").as("sys_id"), col("ts").as("t"), col("power").as("p"))
    val alt = new DataHandler(renamed, "sys_id", "t", "p")
    assert(alt.report().count() == 3)
    assert(alt.clippingCheck().count() > 0)
  }

  test("round-6 facade methods: estimateAll, clear days, quantiles, mask augment") {
    // one-call orientation report delegates to Profiler.estimateAll
    val all = dh.estimateLocationAndOrientation()
    assert(all.count() == 3)
    assert(all.columns.toSet == Set("site", "lon_est", "lat_est", "tilt_deg",
      "azimuth_duffie_deg", "n_days", "n_cells"))
    // clear-day verdicts per (site, day)
    val clear = dh.detectClearDays(slotsPerDay = 96)
    assert(clear.select("site", "day").distinct().count() == clear.count())
    assert(clear.columns.contains("clear"))
    // day-grain mask joins back at row grain; rows with no mask row
    // (sites 1-2 here — the mask covers site 0 only) come back false
    val aug = dh.augmentDataFrame(clear.filter(col("site") === 0L), "clear", "is_clear")
    assert(aug.count() == fleet.count(), "mask attach must not change row count")
    assert(aug.columns.contains("is_clear"))
    assert(aug.filter(col("is_clear")).select("site").distinct().count() == 1,
      "only the masked site may flag true")
    assert(aug.filter(col("site") =!= 0L && col("is_clear")).count() == 0,
      "unmatched rows must fill false, not null")
  }

  test("round-7 facade methods: the three study sweeps delegate to Study") {
    import graft.analyses.Study
    // raw-only latitude study: same rows as the operator called direct
    val latF = dh.latitudeStudy(includeFilled = false).collect().toSet
    val latD = Study.latitudeStudy(spark, fleet, "site", "ts", "power",
      includeFilled = false).collect().toSet
    assert(latF == latD, "latitudeStudy facade must equal the operator")
    val lon = dh.longitudeStudy(includeFilled = false)
    assert(lon.columns.contains("estimator"))
    assert(lon.select("estimator").distinct().count() == 4)
    val ta = dh.tiltAzimuthStudy()
    assert(ta.columns.toSet.contains("day_range"))
    assert(ta.select("delta_method").distinct().count() == 2)
  }

  test("quality-cluster facade emits one canonical-labeled row per observed day") {
    val qc = dh.detectQualityClusters().collect()
    val days = fleet.selectExpr("site", "CAST(ts AS DATE)").distinct().count()
    assert(qc.length == days, s"${qc.length} rows vs $days site-days")
    // the clean synthetic fleet is dense: most days must land in a cluster
    val clustered = qc.count(_.getAs[String]("cluster_day") != null)
    assert(clustered > qc.length / 2, s"only $clustered/${qc.length} clustered")
  }

  test("round-11 facade: every reference plot method has a DataHandler delegate returning its table") {
    // each delegate must equal its PlotTables operator (one-line
    // delegation, no logic in the facade) — spot-check row counts and
    // a value column on the cheap ones, existence on the rest
    val he = dh.plotHeatmapTable(slotsPerDay = 24)
    assert(he.count() ==
      graft.analyses.PlotTables.heatmapTable(fleet, "site", "ts", "power", 24).count())
    assert(dh.plotDailySignalsTable(numDays = 2, slotsPerDay = 24).count() > 0)
    assert(dh.plotDensitySignalTable().columns.contains("density"))
    assert(dh.plotClippingTable().columns.toSet.intersect(Set("clip1", "clip2")).size == 2)
    assert(dh.plotDailyMaxCdfTable().count() > 0)
    assert(dh.plotCapacityChangeTable().count() > 0)
    assert(dh.plotDailyEnergyTable(slotsPerDay = 24).columns.contains("energy"))
    assert(dh.plotTimeShiftTable().columns.toSet ==
      Set("site", "day", "metric", "s1", "signal_model", "used"))
    val circGood = dh.plotCircDistTable("good", numBins = 12)
    val circBad = dh.plotCircDistTable("bad", numBins = 12)
    val nDays = fleet.selectExpr("site", "CAST(ts AS DATE)").distinct().count()
    val tot = circGood.agg(sum(col("n_days"))).collect()(0).getLong(0) +
      (if (circBad.isEmpty) 0L else circBad.agg(sum(col("n_days"))).collect()(0).getLong(0))
    assert(tot == nDays, s"good+bad circ-dist counts $tot must cover all $nDays site-days")
    intercept[IllegalArgumentException](dh.plotCircDistTable("clear"))
  }

  test("round-11 facade: findClippedTimes mask attaches via augmentDataFrame without multiplying rows") {
    val mask = dh.findClippedTimes(slotsPerDay = 96)
    assert(mask.columns.toSet == Set("site", "day", "slot", "clipped"))
    assert(mask.count() == fleet.count(), "mask must be row-grain 1:1")
    val augmented = dh.augmentDataFrame(mask, "clipped", "clipped_times", slotsPerDay = 96)
    assert(augmented.count() == fleet.count(), "attach must never multiply rows")
    assert(augmented.columns.contains("clipped_times"))
    val nullFlags = augmented.filter(col("clipped_times").isNull).count()
    assert(nullFlags == 0, "attached mask must be a total boolean")
  }

  test("round-11 facade: SCSF fit is the high-quantile surface; performance index = measured/clear") {
    val fit = dh.fitStatisticalClearSky(quantileLevel = 0.9, nBins = 20)
    assert(fit.columns.toSet == Set("site", "day", "dil_slot", "dil_value", "scsf"))
    val pi = dh.scsfPerformanceIndex(quantileLevel = 0.9, nBins = 20).collect()
    assert(pi.nonEmpty)
    pi.foreach { r =>
      val m = r.getAs[Double]("measured_energy")
      val c = r.getAs[Double]("clear_energy")
      val p = r.getAs[Any]("scsf_pi")
      if (c != 0.0) {
        assert(math.abs(p.asInstanceOf[Double] - m / c) < 1e-12, "pi must be the energy ratio")
      } else assert(p == null, "zero clear energy must yield null pi, not a crash")
    }
    // a clean synthetic fleet tracks its own 0.9-quantile closely:
    // the bulk of day indices must land in a plausible band
    val inBand = pi.count { r =>
      val p = r.getAs[Any]("scsf_pi")
      p != null && p.asInstanceOf[Double] > 0.2 && p.asInstanceOf[Double] < 2.0
    }
    assert(inBand > pi.length / 2, s"only $inBand/${pi.length} PI values in (0.2, 2)")
  }

  test("round-13 parity: undilated PI ratio equals the dilated-grain ratio per day") {
    // undilation is the same energy-preserving piecewise-constant
    // integral on the measured and clear columns, so the per-day
    // scale factor cancels: the REPORTED grain changed (reference
    // parity, data_handler.py:2376-2465), the ratio must not
    val fit = dh.fitStatisticalClearSky(quantileLevel = 0.9, nBins = 20)
    val dilated = fit.groupBy(col("site"), col("day"))
      .agg((sum(col("dil_value")) / sum(col("scsf"))).as("pi_dil"))
      .collect().map(r => (r.getAs[Long]("site"), r.getAs[String]("day")) ->
        r.getAs[Double]("pi_dil")).toMap
    val und = dh.scsfPerformanceIndex(quantileLevel = 0.9, nBins = 20, outSlots = 96)
      .filter(col("scsf_pi").isNotNull).collect()
    assert(und.nonEmpty)
    var compared = 0
    und.foreach { r =>
      val k = (r.getAs[Long]("site"), r.getAs[String]("day"))
      dilated.get(k).filterNot(_.isNaN).foreach { pd =>
        compared += 1
        assert(math.abs(r.getAs[Double]("scsf_pi") - pd) < 1e-9,
          s"undilated PI diverged from the dilated ratio at $k")
      }
    }
    assert(compared > 0, "no comparable (site, day) keys")
  }
}
