package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.solvers.Kernels
import graft.sources.Tables

/** Golden parity for the density score (reference `data_quality.py:
  * 28-53`: per-day data density normalized by its seasonal quantile
  * fit; golden vector `tests/fixtures/scoring/density.csv` from the
  * reference's e2e run on its own timeseries fixture). Different
  * solver, same semantics — scores must track the golden within a
  * small band.
  */
class GoldenDensitySpec extends AnyFunSuite {
  lazy val spark: SparkSession = GraftSession.local("8")

  test("density scores track the reference golden vector") {
    val ts = Tables.csvTimeSeries(spark, "/root/reference/tests/fixtures/data_transforms/timeseries.csv")
      .select(col("ts"), col("ac_power_01").as("power"))
      .filter(col("power").isNotNull)
    // raw per-day data density on the 288-slot 5-min grid
    val dens = ts.groupBy(to_date(col("ts")).cast("string").as("day"))
      .agg((count(lit(1)) / 288.0).as("density"))
      .orderBy("day")
      .collect()
      .map(r => r.getString(0) -> r.getDouble(1))
    val y = dens.map(_._2)
    val t = Array.tabulate(y.length)(_.toDouble)
    val fit = Kernels.quantileFourierFit(y, t, tau = 0.85, harmonics = 2, period = 7.0)
    val score = y.indices.map(i => if (fit(i) > 0) y(i) / fit(i) else 0.0)

    val src = scala.io.Source.fromFile("/root/reference/tests/fixtures/scoring/density.csv")
    val golden = try src.getLines().map(_.trim.toDouble).toArray finally src.close()
    assert(golden.length == score.length, s"${golden.length} vs ${score.length} days")

    val diffs = score.indices.map(i => math.abs(score(i) - golden(i))).sorted
    val med = diffs(diffs.length / 2)
    val p90 = diffs((diffs.length * 0.9).toInt)
    assert(med < 0.05, f"median |Δscore| $med%.4f")
    assert(p90 < 0.15, f"p90 |Δscore| $p90%.4f")
  }
}
