package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.analyses.Pipeline
import graft.operators.{DayStats, TimeAxis}
import graft.sources.Tables

/** Golden-fixture parity against the reference's own end-to-end test
  * data (`/root/reference/tests/fixtures/data_transforms/timeseries.csv`,
  * BSD-licensed; golden values from
  * `tests/solardatatools/test_data_handler.py:25-49`: capacity 6.745,
  * quality 0.9948, clearness 0.4922, clipping=True, time_shifts=False).
  * Metrics with identical definitions (capacity = p95, sampling freq)
  * are asserted tightly; pipeline scores whose reference definitions
  * involve the full solver stack are asserted within coarse bands.
  */
class GoldenParitySpec extends AnyFunSuite {
  lazy val spark: SparkSession = GraftSession.local("8")
  val fixture = "/root/reference/tests/fixtures/data_transforms/timeseries.csv"

  lazy val ts = Tables.csvTimeSeries(spark, fixture)
    .select(lit(0L).as("site"), col("ts"), col("ac_power_01").as("power"))
    .filter(col("power").isNotNull)
    .cache()

  test("capacity estimate matches the reference golden value") {
    val cap = DayStats.capacity(ts, "site", "power").collect()(0).getDouble(1)
    assert(math.abs(cap - 6.745) < 0.05, s"capacity $cap vs golden 6.745")
  }

  test("sampling frequency inferred as 300 s") {
    val f = TimeAxis.inferFrequency(ts, Seq("site"), "ts").collect()(0).getLong(1)
    assert(f == 300L, s"freq $f")
  }

  test("pipeline metrics land in the golden neighborhood") {
    val r = Pipeline.run(spark, ts, "site", "ts", "power").collect()(0)
    assert(r.errors.isEmpty, s"stage errors: ${r.errors}")
    // the fixture carries ~193 calendar days of (mostly daytime) scans
    assert(r.nDays >= 150 && r.nDays <= 250, s"nDays ${r.nDays}")
    // golden quality 0.9948 — our density-based analog must agree this
    // is a very clean dataset
    assert(r.qualityScore > 0.85, s"quality ${r.qualityScore}")
    // golden clearness 0.4922 — simplified clear-day analog in band
    assert(r.clearFrac > 0.15 && r.clearFrac < 0.8, s"clearFrac ${r.clearFrac}")
    // golden time_shifts=False — a well-behaved clock
    assert(r.timeShiftDays < r.nDays / 5, s"timeShiftDays ${r.timeShiftDays}")
    // daylight sanity on real PV data
    val rs = DayStats.riseSetRough(ts, "site", "ts", "power", 0.05)
    val med = rs.agg(percentile(col("daylight_h"), lit(0.5))).collect()(0).getDouble(0)
    assert(med > 8.0 && med < 16.0, s"median daylight $med")
  }

  test("clipping is detected on this system (golden inverter_clipped=True)") {
    val daily = ts.groupBy(to_date(col("ts")).as("day")).agg(max(col("power")).as("daily_max"))
    val sorted = daily.select("daily_max").collect().map(_.getDouble(0)).sorted
    val fit = graft.solvers.Kernels.cdfPwlFit(sorted, lambdaD2 = 100.0)
    val span = math.max(sorted.last - sorted.head, 1e-9)
    val d = fit.indices.drop(1).map(i => fit(i) - fit(i - 1))
    val flat = d.zipWithIndex.count { case (dd, i) => i > d.length / 2 && dd < 0.001 * span }
    assert(flat > d.length / 10, s"upper-CDF flat run $flat of ${d.length}")
  }
}
