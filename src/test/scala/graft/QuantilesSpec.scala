package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.analyses.Quantiles
import graft.operators.{Dilation, Salting}
import graft.sources.Synth

class QuantilesSpec extends AnyFunSuite {
  lazy val spark: SparkSession = GraftSession.local("8")
  import spark.implicits._

  test("2-period quantile envelopes order correctly and clear-sky labels dominate on clean synth") {
    val fleet = Synth.pvFleet(spark, nSites = 1, nDays = 60, slotsPerDay = 48)
    val dil = Dilation.dilate(spark, fleet, "site", "ts", "power", nBins = 50)
    val out = Quantiles.estimateAndDetect(spark, dil, nBins = 50).cache()
    val n = out.count()
    assert(n == 60L * 50)
    val ordered = out
      .agg(avg(when(col("q_hi") >= col("q_mid") && col("q_mid") >= col("q_lo"), 1.0).otherwise(0.0)))
      .as[Double].head()
    assert(ordered > 0.9, s"quantile ordering held on only $ordered")
    val clearFrac = out.agg(avg(col("clear").cast("double"))).as[Double].head()
    assert(clearFrac > 0.5, s"clearFrac $clearFrac")
    // envelope actually tracks the signal: q_hi close to observed high values
    val cov = out.agg(avg(when(col("dil_value") <= col("q_hi") * 1.2, 1.0).otherwise(0.0))).as[Double].head()
    assert(cov > 0.8, s"envelope coverage $cov")
  }

  test("quantile envelope undilates back to the hour grid with energy preserved") {
    val fleet = Synth.pvFleet(spark, nSites = 1, nDays = 30, slotsPerDay = 48)
    val dil = Dilation.dilate(spark, fleet, "site", "ts", "power", nBins = 50)
    val est = Quantiles.estimateAndDetect(spark, dil, nBins = 50)
    // undilate the q_hi envelope (reference `undilate_quantiles`,
    // dilation.py:143-171): treat it as the dilated series
    val siteMax = fleet.agg(max("power")).as[Double].head()
    val riseSet = fleet
      .select(col("site"), to_date(col("ts")).cast("string").as("day"),
        graft.operators.TimeAxis.hourOfDay(col("ts")).as("h"), col("power"))
      .filter(col("power") > siteMax * 0.01)
      .groupBy("site", "day")
      .agg(min("h").as("rise_h"), max("h").as("set_h"))
    val hiDilated = est.select(col("site"), col("day"), col("dil_slot"), col("q_hi").as("dil_value"))
    val back = Dilation.undilate(spark, hiDilated, riseSet, outSlots = 48)
    val dilE = hiDilated.join(riseSet, Seq("site", "day"))
      .agg(sum(col("dil_value") * (col("set_h") - col("rise_h")) / 50.0)).as[Double].head()
    val backE = back.join(riseSet, Seq("site", "day"))
      .agg(sum(col("value") * (col("set_h") - col("rise_h")) / 48.0)).as[Double].head()
    assert(math.abs(dilE - backE) < 1e-6 * math.abs(dilE), s"dil $dilE back $backE")
    assert(back.count() == 30L * 48)
  }

  test("salted aggregation equals direct aggregation") {
    val fleet = Synth.pvFleet(spark, nSites = 2, nDays = 10, slotsPerDay = 24)
    val direct = fleet.groupBy("site").agg(sum("power").as("sum_v"), count(lit(1)).as("n"))
    val salted = Salting.saltedSumCount(fleet, Seq("site"), "power", 16)
    val joined = direct.join(salted.withColumnRenamed("sum_v", "s2").withColumnRenamed("n", "n2"), "site")
    val bad = joined.filter(abs(col("sum_v") - col("s2")) > 1e-6 || col("n") =!= col("n2")).count()
    assert(bad == 0)
  }
}
