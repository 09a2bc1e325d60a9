package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.solvers.Kernels
import graft.sources.Tables

/** Golden parity for the linearity score (reference
  * `data_quality.py:56-83`: per-day count of the modal rounded slot
  * difference — values below 0.5% capacity masked — normalized by
  * (slots−1)·density-fit; golden `tests/fixtures/scoring/
  * linearity.csv`, asserted by the reference at atol 2e-2).
  */
class GoldenLinearitySpec extends AnyFunSuite {
  lazy val spark: SparkSession = GraftSession.local("8")

  test("linearity scores track the reference golden vector") {
    val ts = Tables.csvTimeSeries(spark, "/root/reference/tests/fixtures/data_transforms/timeseries.csv")
      .select(col("ts"), col("ac_power_01").as("power"))
      .filter(col("power").isNotNull)
      .cache()
    val cap = ts.agg(percentile(col("power"), lit(0.95))).collect()(0).getDouble(0)

    // modal rounded diff count per day, only across adjacent 300 s
    // slots with both values above the 0.5% capacity mask (the
    // reference's NaN-omitting matrix diff)
    val w = Window.partitionBy(to_date(col("ts"))).orderBy(col("ts"))
    val masked = ts.filter(col("power") >= 0.005 * cap)
    val diffs = masked
      .withColumn("day", to_date(col("ts")).cast("string"))
      .withColumn("dt", unix_timestamp(col("ts")) - lag(unix_timestamp(col("ts")), 1).over(w))
      .withColumn("diff", round(col("power") - lag(col("power"), 1).over(w), 4))
      .filter(col("dt") === 300)
    val modeCnt = diffs
      .groupBy(col("day"), col("diff"))
      .agg(count(lit(1)).as("cnt"))
      .groupBy(col("day"))
      .agg(max(col("cnt")).as("mode_cnt"))
      .collect()
      .map(r => r.getString(0) -> r.getLong(1))
      .toMap

    // density fit exactly as the density-score golden test
    val dens = ts.groupBy(to_date(col("ts")).cast("string").as("day"))
      .agg((count(lit(1)) / 288.0).as("density"))
      .orderBy("day")
      .collect()
      .map(r => r.getString(0) -> r.getDouble(1))
    val fit = Kernels.quantileFourierFit(
      dens.map(_._2), Array.tabulate(dens.length)(_.toDouble), tau = 0.85, harmonics = 2, period = 7.0)

    val score = dens.indices.map { i =>
      val (day, _) = dens(i)
      modeCnt.getOrElse(day, 0L).toDouble / (287.0 * math.max(fit(i), 1e-9))
    }

    val src = scala.io.Source.fromFile("/root/reference/tests/fixtures/scoring/linearity.csv")
    val golden = try src.getLines().map(_.trim.toDouble).toArray finally src.close()
    assert(golden.length == score.length, s"${golden.length} vs ${score.length} days")

    val diffsAbs = score.indices.map(i => math.abs(score(i) - golden(i))).sorted
    val med = diffsAbs(diffsAbs.length / 2)
    val p90 = diffsAbs((diffsAbs.length * 0.9).toInt)
    assert(med < 0.02, f"median |Δscore| $med%.4f")
    assert(p90 < 0.06, f"p90 |Δscore| $p90%.4f")
  }
}
