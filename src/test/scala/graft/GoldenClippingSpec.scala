package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{DayStats, Filling}
import graft.sources.Tables

/** Golden parity for the two clipping statistics (reference
  * `algorithms/clipping.py:54-68`; golden vectors
  * `tests/fixtures/scoring/clipping_1.csv` / `clipping_2.csv`,
  * asserted by the reference's own e2e test at atol 1e-3 / 2e-3).
  *
  * The reference computes the stats from its filled matrix, so this
  * spec runs `Filling.filledDayGrid` first and `DayStats.clipStats`'s
  * formulas on the filled grid; both vectors must match at the
  * reference's own tolerances on every day (including day 0, whose
  * missing morning is infilled — raw-only stats would be 0.065 off
  * there).
  */
class GoldenClippingSpec extends AnyFunSuite {
  lazy val spark: SparkSession = GraftSession.local("8")

  test("clip stats match the reference golden vectors") {
    val ts = Tables.csvTimeSeries(spark, "/root/reference/tests/fixtures/data_transforms/timeseries.csv")
      .select(col("ts"), col("ac_power_01").as("power"))
      .filter(col("power").isNotNull)
      .withColumn("site", lit(0L))

    val filled = Filling.filledDayGrid(ts, "site", "ts", "power", slotsPerDay = 288)
    val daily = filled.groupBy(col("day")).agg(max(col("filled")).as("daily_max"))
    val siteMax = daily.agg(max(col("daily_max"))).collect()(0).getDouble(0)
    val np = col("filled") / col("daily_max")
    val rows = filled
      .join(broadcast(daily), Seq("day"))
      .filter(col("daily_max") > 0)
      .groupBy(col("day"))
      .agg(
        (first(col("daily_max")) / siteMax).as("clip1"),
        (sum(when(np > 0.995, np).otherwise(lit(0.0))) / sum(np)).as("clip2")
      )
      .orderBy(col("day"))
      .collect()
    val c1 = rows.map(_.getDouble(1))
    val c2 = rows.map(_.getDouble(2))

    def loadVec(p: String): Array[Double] = {
      val src = scala.io.Source.fromFile(p)
      try src.getLines().map(_.trim.toDouble).toArray finally src.close()
    }
    val g1 = loadVec("/root/reference/tests/fixtures/scoring/clipping_1.csv")
    val g2 = loadVec("/root/reference/tests/fixtures/scoring/clipping_2.csv")
    assert(g1.length == c1.length, s"${g1.length} vs ${c1.length} days")

    val d1max = c1.indices.map(i => math.abs(c1(i) - g1(i))).max
    assert(d1max < 1e-3, f"clip_stat_1 max |Δ| $d1max%.2e")
    val d2max = c2.indices.map(i => math.abs(c2(i) - g2(i))).max
    assert(d2max < 2e-3, f"clip_stat_2 max |Δ| $d2max%.2e")
  }

  /** `find_clipped_times` contract (reference `clipping.py:109-128`)
    * on the reference timeseries fixture — the system the reference's
    * own e2e test asserts `inverter_clipped=True` for. No golden mask
    * vector exists in the reference fixtures, so the contract is the
    * rule itself: the mask is non-trivial on a known-clipping system,
    * every flagged sample is within 1% (site-max scale) of a point
    * mass AND ≥98% of its day's max, and every sample below the 98%
    * band is unflagged.
    */
  test("clippedTimes mask obeys the find_clipped_times rule on the clipping fixture") {
    val ts = Tables.csvTimeSeries(spark, "/root/reference/tests/fixtures/data_transforms/timeseries.csv")
      .select(col("ts"), col("ac_power_01").as("power"))
      .filter(col("power").isNotNull)
      .withColumn("site", lit(0L))

    val mask = DayStats.clippedTimes(ts, "site", "ts", "power")
    val dayMax = ts.groupBy(to_date(col("ts")).as("day"))
      .agg(max(col("power")).as("daily_max"))
    val joined = mask.join(broadcast(dayMax), Seq("day")).collect()

    val nClipped = joined.count(_.getAs[Boolean]("clipped"))
    assert(nClipped > 0, "known-clipping fixture produced an all-false mask")
    // every flagged sample is within the 2%-of-daily-max band
    joined.filter(_.getAs[Boolean]("clipped")).foreach { r =>
      val v = r.getAs[Double]("power")
      val dm = r.getAs[Double]("daily_max")
      assert(dm != 0.0 && v / dm >= 0.98,
        s"clipped sample $v below 98% of daily max $dm")
    }
    // no sample below the band is flagged (the ∧ in the rule)
    val below = joined.filter { r =>
      val dm = r.getAs[Double]("daily_max")
      dm == 0.0 || r.getAs[Double]("power") / dm < 0.98
    }
    assert(below.forall(!_.getAs[Boolean]("clipped")))
    // mask is a strict subset of samples, not a day blanket: at least
    // one unflagged sample exists on every flagged sample's day
    val flaggedDays = joined.filter(_.getAs[Boolean]("clipped"))
      .map(_.getAs[java.sql.Date]("day")).toSet
    val unflaggedOnFlaggedDays = joined.count(r =>
      flaggedDays.contains(r.getAs[java.sql.Date]("day")) && !r.getAs[Boolean]("clipped"))
    assert(unflaggedOnFlaggedDays > 0, "mask flags entire days — should select near-max samples only")
  }
}
