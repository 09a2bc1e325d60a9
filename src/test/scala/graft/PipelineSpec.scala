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
