package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.analyses.ClearDay

/** Golden parity for clear-day detection on the reference's own
  * one-year fixture (`tests/fixtures/clear_day_detection/`): the
  * engine's local-envelope detector vs the reference's golden weights
  * (clear ⇔ weight ≥ 1e-3). Solver internals differ, so we assert
  * classification quality on the real data, not bit equality.
  */
class GoldenClearDaySpec extends AnyFunSuite {
  lazy val spark: SparkSession = GraftSession.local("8")

  test("clear-day flags reach 0.85 balanced accuracy vs the reference golden") {
    import spark.implicits._
    val src = scala.io.Source.fromFile(
      "/root/reference/tests/fixtures/clear_day_detection/one_year_power_signals_1.csv")
    val m = try src.getLines().map(_.split(",").filter(_.nonEmpty).map(_.toDouble)).toArray
    finally src.close()
    val wsrc = scala.io.Source.fromFile(
      "/root/reference/tests/fixtures/clear_day_detection/one_year_weights_1.csv")
    val golden = try wsrc.getLines().map(_.trim.toDouble >= 1e-3).toArray
    finally wsrc.close()
    val nSlots = m.length // 288 (5-min)
    val nDays = m.head.length

    val epoch0 = 1420070400L // 2015-01-01 UTC
    val rows = for (d <- 0 until nDays; k <- 0 until nSlots)
      yield (0L, epoch0 + d * 86400L + k * 300L, m(k)(d))
    val df = rows.toDF("site", "e", "value").withColumn("ts", timestamp_seconds(col("e")))

    val out = ClearDay.detect(spark, df, "site", "ts", "value", slotsPerDay = nSlots)
      .select(col("day"), col("clear"))
      .collect()
      .map(r => r.getString(0) -> r.getBoolean(1))
      .toMap
    val dayStr = (d: Int) => java.time.LocalDate.ofEpochDay(epoch0 / 86400 + d).toString
    val ours = Array.tabulate(nDays)(d => out.getOrElse(dayStr(d), false))

    val tp = golden.indices.count(i => golden(i) && ours(i)).toDouble
    val tn = golden.indices.count(i => !golden(i) && !ours(i)).toDouble
    val recall = tp / math.max(golden.count(identity), 1)
    val specificity = tn / math.max(golden.count(!_), 1)
    val balanced = (recall + specificity) / 2
    assert(golden.count(identity) > 30, "fixture should contain clear days")
    assert(balanced > 0.85, f"balanced accuracy $balanced%.3f (recall $recall%.3f, specificity $specificity%.3f)")
  }
}
