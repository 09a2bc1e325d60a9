package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.analyses.Shade
import graft.operators.Dilation
import graft.sources.Synth

/** Shade detection: a persistent time-of-day-locked 70% loss window
  * must be flagged; the unshaded control site must stay clean.
  */
class ShadeSpec extends AnyFunSuite {
  lazy val spark: SparkSession = GraftSession.local("8")
  import spark.implicits._

  test("detects an injected morning shade window on site 0 only") {
    val fleet = Synth.pvFleet(spark, nSites = 2, nDays = 40, slotsPerDay = 48)
    val hr = graft.operators.TimeAxis.hourOfDay(col("ts"))
    val shaded = fleet.withColumn(
      "power",
      when(col("site") === 0 && hr >= 8.0 && hr < 10.0, col("power") * 0.3).otherwise(col("power"))
    )
    val dil = Dilation.dilate(spark, shaded, "site", "ts", "power", nBins = 50)
    val slots = Shade.slotShade(dil, nBins = 50).cache()
    val summary = Shade.siteSummary(slots).collect().map(r =>
      r.getAs[Long]("site") -> (r.getAs[Double]("shaded_frac"), r.getAs[Long]("longest_shade_run"))
    ).toMap
    val (frac0, run0) = summary(0L)
    val (frac1, run1) = summary(1L)
    assert(frac0 > 0.05, s"site0 shaded_frac $frac0")
    assert(run0 >= 3, s"site0 longest run $run0")
    assert(frac1 < frac0 / 2, s"control site shaded_frac $frac1 vs $frac0")
  }

  test("fleet-PCA basis restores the envelope under a notch (one site of many)") {
    // 12 sites with amplitude-varying bell profiles; site 0 loses 70%
    // in a fixed morning window. The fleet PCA basis is dominated by
    // unshaded shapes, so site 0's projection fills the notch back in.
    val fleet = Synth.pvFleet(spark, nSites = 12, nDays = 20, slotsPerDay = 48)
    val hr = graft.operators.TimeAxis.hourOfDay(col("ts"))
    val shaded = fleet.withColumn(
      "power",
      when(col("site") === 0 && hr >= 8.0 && hr < 10.0, col("power") * 0.3).otherwise(col("power"))
    )
    val dil = Dilation.dilate(spark, shaded, "site", "ts", "power", nBins = 50)
    val slots = Shade.pcaShade(spark, dil, nBins = 50, k = 2).cache()
    val summary = Shade.siteSummary(slots).collect().map(r =>
      r.getAs[Long]("site") -> r.getAs[Double]("shaded_frac")
    ).toMap
    assert(summary(0L) > 0.05, s"site0 pca shaded_frac ${summary(0L)}")
    val controls = (1L to 11L).map(summary)
    assert(controls.max < summary(0L), s"controls $controls vs site0 ${summary(0L)}")
  }
}
