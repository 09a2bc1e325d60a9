package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Dilation
import graft.sources.Synth

/** Dilation: energy conservation + round-trip properties (the
  * invariants the reference asserts ad hoc;
  * `tests/solardatatools/test_quantile_and_dilation.py`).
  */
class DilationSpec extends AnyFunSuite {
  lazy val spark: SparkSession = GraftSession.local("8")
  import spark.implicits._

  test("dilate preserves daylight energy and emits a full grid per day") {
    val fleet = Synth.pvFleet(spark, nSites = 1, nDays = 3, slotsPerDay = 96)
    val dil = Dilation.dilate(spark, fleet, "site", "ts", "power", nBins = 100, thresholdFrac = 0.01)
    val counts = dil.groupBy("site", "day").count().select("count").as[Long].collect()
    assert(counts.nonEmpty && counts.forall(_ == 100L))

    // energy conservation on one day, vs a direct trapezoid integral
    val day = dil.select("day").distinct().orderBy("day").as[String].head()
    val pts = fleet
      .filter(to_date(col("ts")).cast("string") === day)
      .select(graft.operators.TimeAxis.hourOfDay(col("ts")).as("h"), col("power"))
      .orderBy("h")
      .as[(Double, Double)]
      .collect()
    val thr = pts.map(_._2).max * 0.01 * 0 // recompute with site max over all days
    val siteMax = fleet.agg(max("power")).as[Double].head()
    val lit = pts.filter(_._2 > siteMax * 0.01)
    val rise = lit.head._1
    val set = lit.last._1
    val seg = pts.filter(p => p._1 >= rise && p._1 <= set)
    val direct = seg.sliding(2).map {
      case Array((t0, v0), (t1, v1)) => (v0 + v1) / 2.0 * (t1 - t0)
      case _ => 0.0
    }.sum
    val dg = (set - rise) / 100.0
    val dilEnergy = dil
      .filter(col("day") === day)
      .agg(sum(col("dil_value") * dg))
      .as[Double]
      .head()
    assert(math.abs(dilEnergy - direct) < 1e-6 * math.max(direct, 1.0), s"dil $dilEnergy direct $direct")
    val _ = thr
  }

  test("undilate round-trips total energy") {
    val fleet = Synth.pvFleet(spark, nSites = 1, nDays = 2, slotsPerDay = 96)
    val dil = Dilation.dilate(spark, fleet, "site", "ts", "power", nBins = 100, thresholdFrac = 0.01)
    // reconstruct rise/set the same way dilate did
    val siteMax = fleet.agg(max("power")).as[Double].head()
    val riseSet = fleet
      .select(col("site"), to_date(col("ts")).cast("string").as("day"),
        graft.operators.TimeAxis.hourOfDay(col("ts")).as("h"), col("power"))
      .filter(col("power") > siteMax * 0.01)
      .groupBy("site", "day")
      .agg(min("h").as("rise_h"), max("h").as("set_h"))
    val back = Dilation.undilate(spark, dil, riseSet, outSlots = 96)
    val dilE = dil.join(riseSet, Seq("site", "day"))
      .agg(sum(col("dil_value") * (col("set_h") - col("rise_h")) / 100.0)).as[Double].head()
    val backE = back.join(riseSet, Seq("site", "day"))
      .agg(sum(col("value") * (col("set_h") - col("rise_h")) / 96.0)).as[Double].head()
    assert(math.abs(dilE - backE) < 1e-6 * dilE, s"dil $dilE back $backE")
  }

  test("undilate2 is bit-identical per column to two separate undilates") {
    val fleet = Synth.pvFleet(spark, nSites = 2, nDays = 3, slotsPerDay = 96)
    val dil = Dilation.dilate(spark, fleet, "site", "ts", "power", nBins = 40, thresholdFrac = 0.01)
      // second column: a deterministic non-trivial transform of the first
      .withColumn("v2", col("dil_value") * 0.75 + col("dil_slot") * 0.001)
    val riseSet = Dilation.riseSetTable(fleet, "site", "ts", "power", 0.01)
    val fused = Dilation.undilate2(
      spark, dil.select(col("site"), col("day"), col("dil_slot"), col("dil_value"), col("v2")),
      riseSet, outSlots = 13) // outSlots not commensurable with nBins: overlap terms exercised
    val sep1 = Dilation.undilate(
      spark, dil.select(col("site"), col("day"), col("dil_slot"), col("dil_value")),
      riseSet, outSlots = 13)
    val sep2 = Dilation.undilate(
      spark, dil.select(col("site"), col("day"), col("dil_slot"), col("v2").as("dil_value")),
      riseSet, outSlots = 13)
    val j = fused
      .join(sep1.withColumnRenamed("value", "ref_1"), Seq("site", "day", "out_slot"))
      .join(sep2.withColumnRenamed("value", "ref_2"), Seq("site", "day", "out_slot"))
    assert(j.count() == fused.count() && fused.count() == sep1.count())
    // exact bit equality, not a tolerance: the fused operator promises
    // the SAME IEEE op sequence per column as the single-column form
    val diff = j.filter(col("value_1") =!= col("ref_1") || col("value_2") =!= col("ref_2")).count()
    assert(diff == 0, s"$diff rows differ between fused and separate undilates")
  }
}
