package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.analyses.Pipeline
import graft.sources.Synth

/** Fleet-pipeline test on the deterministic synthetic PV fleet
  * (mirrors the reference's end-to-end golden test shape,
  * `tests/solardatatools/test_data_handler.py:9-49`).
  */
class PipelineSpec extends AnyFunSuite {
  lazy val spark: SparkSession = GraftSession.local("8")

  test("pipeline produces a per-site report with sane metrics") {
    val fleet = Synth.pvFleet(spark, nSites = 3, nDays = 120, slotsPerDay = 48, capStep = 1)
    val report = Pipeline.run(spark, fleet, "site", "ts", "power").collect().sortBy(_.site)
    assert(report.length == 3)
    report.foreach { r =>
      assert(r.nDays == 120, s"site ${r.site} nDays ${r.nDays}")
      assert(r.errors.isEmpty, s"site ${r.site} errors: ${r.errors}")
      assert(r.capacity > 0)
      assert(r.qualityScore >= 0.0 && r.qualityScore <= 1.0)
      assert(r.clearFrac >= 0.0 && r.clearFrac <= 1.0)
      // MC degradation interval: ordered and containing the median
      assert(r.degrRateP025 <= r.degrRateP50 && r.degrRateP50 <= r.degrRateP975,
        s"site ${r.site} MC interval (${r.degrRateP025}, ${r.degrRateP50}, ${r.degrRateP975})")
      // the stabilization exit fired: ≥ 20 samples drawn and the
      // running P50/P2.5/P97.5 met tolerance before the 500 cap
      // (reference `loss_factor_analysis.py:78-197`)
      assert(r.mcSamples >= 20 && r.mcSamples <= 500, s"site ${r.site} mcSamples ${r.mcSamples}")
      assert(r.mcConverged, s"site ${r.site} MC did not stabilize in ${r.mcSamples} samples")
      // clean synthetic PV: the DP labels at least half the days clear
      // (the capacity-step site loses its post-step days — the envelope
      // fit stays at the old capacity, which is exactly right)
      assert(r.clearSkyDays >= r.nDays / 2, s"site ${r.site} clearSkyDays ${r.clearSkyDays}")
    }
    // site 1 has a mid-series capacity halving: the pwc stage must see
    // at least one change there, and fewer on the stable sites
    val stepSite = report.find(_.site == 1L).get
    assert(stepSite.capacityChanges >= 1, s"capacityChanges ${stepSite.capacityChanges}")
  }

  test("seeded MC degradation sampler reproduces the reference's stabilization exit") {
    // reference `loss_factor_analysis.py:106-196`: random (τ, stiffness,
    // 20% holdout) samples until P50/P2.5/P97.5 running stats stabilize
    // (last change AND 10-sample mean change within tolerance), ≥ 20
    // and ≤ 500 samples. Two years of daily energy with a known −15%/yr
    // exponential degradation + weekly seasonality + noise.
    import graft.solvers.Kernels
    val n = 730
    val t = Array.tabulate(n)(_.toDouble)
    val rng = new scala.util.Random(42)
    val truthRate = math.log(0.85) / 365.2425 // −15%/yr in per-day log space
    val energy = t.map { d =>
      10.0 * math.exp(truthRate * d) *
        (1.0 + 0.05 * math.sin(2 * math.Pi * d / 7.0)) *
        (1.0 - 0.03 * rng.nextDouble())
    }
    val (stats, samples, converged) =
      Kernels.mcDegradationRate(energy, t, seed = 7L, period = 7.0, harmonics = 2)
    assert(converged, s"MC did not stabilize within 500 samples (drew $samples)")
    assert(samples >= 20 && samples <= 500, s"samples $samples")
    assert(stats(1) <= stats(0) && stats(0) <= stats(2),
      s"interval not ordered: (${stats(1)}, ${stats(0)}, ${stats(2)})")
    // annualized %/yr estimate lands near the injected −15%/yr
    assert(math.abs(stats(0) - (-15.0)) < 3.0, s"P50 ${stats(0)} vs −15%/yr")
    // seeded: same seed, same draw sequence, same result
    val (stats2, samples2, _) =
      Kernels.mcDegradationRate(energy, t, seed = 7L, period = 7.0, harmonics = 2)
    assert(samples2 == samples && stats2.sameElements(stats), "seeded run not reproducible")
  }

  test("multi-year site: annual-period fit recovers seasonality the weekly fit aliases") {
    // Three years of daily stats with a ±40% annual energy cycle and a
    // deterministic 20% cloudy-day pattern. The span-aware default
    // must pick the annual period (365.2425) — its τ=0.9 envelope
    // tracks the cycle and keeps winter clear days clear. A forced
    // weekly fit can't represent the annual harmonic: its envelope
    // sits near the summer peak, so winter clear days fall below the
    // 0.8 ratio and clearFrac collapses.
    val n = 1096
    val days = Array.tabulate(n) { d =>
      val seasonal = 1.0 + 0.4 * math.sin(2 * math.Pi * d / 365.2425)
      val cloudy = d % 5 == 3
      val e = 10.0 * seasonal * (if (cloudy) 0.45 else 1.0)
      // cloudy days are rough (high Σ|2nd diff|), clear days smooth —
      // the 3-signal clear rule needs the smoothness channel to agree
      graft.analyses.DayRow(0L, d.toDouble, e, if (cloudy) 0.7 else 0.98, e / 10.0, 12.0, 288L, 1.0,
        if (cloudy) 8.0 else 0.5)
    }
    val annual = Pipeline.analyzeSite(0L, days) // span 1095 d → annual default
    val weekly = Pipeline.analyzeSite(0L, days, period = Some(7.0))
    assert(annual.errors.isEmpty, s"annual errors: ${annual.errors}")
    // 4 of 5 days are clear by construction; the annual envelope keeps them
    assert(annual.clearFrac > 0.7, s"annual clearFrac ${annual.clearFrac}")
    // the weekly fit aliases the annual cycle away: clear fraction collapses
    assert(weekly.clearFrac < annual.clearFrac - 0.2,
      s"weekly ${weekly.clearFrac} vs annual ${annual.clearFrac}")
  }

  test("pipeline is best-effort per site: degenerate site reports errors, not exceptions") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // a site with two rows only — too short for every solver stage
    val tiny = Seq(
      (99L, java.sql.Timestamp.valueOf("2024-01-01 12:00:00"), 1.0),
      (99L, java.sql.Timestamp.valueOf("2024-01-01 12:05:00"), 2.0)
    ).toDF("site", "ts", "power")
    val rep = Pipeline.run(spark, tiny, "site", "ts", "power").collect()
    assert(rep.length == 1)
    assert(rep(0).nDays == 1)
  }
}
