package graft.examples

import org.apache.spark.sql.functions._

import graft.GraftSession
import graft.analyses.{Pipeline, Quantiles, Shade, TimeShift}
import graft.operators.Dilation
import graft.sources.Synth

/** End-to-end demo of the solar lifecycle on the synthetic fleet:
  * generate → pipeline report → dilation → quantile envelopes +
  * clear-sky → shade summary → time-shift table. Shows library
  * ergonomics and doubles as a runnable smoke for the whole stack.
  *
  * Usage: runMain graft.examples.FleetDemo [nSites] [nDays]
  */
object FleetDemo {
  def main(args: Array[String]): Unit = {
    val nSites = args.headOption.map(_.toInt).getOrElse(3)
    val nDays = args.lift(1).map(_.toInt).getOrElse(90)
    val spark = GraftSession.local()
    val fleet = Synth.pvFleet(spark, nSites, nDays, slotsPerDay = 48, capStep = 1).cache()

    val report = Pipeline.run(spark, fleet, "site", "ts", "power")
    println("[demo] fleet report:")
    report.toDF().orderBy("site").show(truncate = false)

    val dil = Dilation.dilate(spark, fleet, "site", "ts", "power", nBins = 50)
    val env = Quantiles.estimateAndDetect(spark, dil, nBins = 50).cache()
    val clearFrac = env.agg(avg(col("clear").cast("double"))).collect()(0).getDouble(0)
    println(f"[demo] dilated grid rows: ${env.count()}, clear-sky fraction: $clearFrac%.3f")

    val shade = Shade.siteSummary(Shade.slotShade(env, nBins = 50))
    println("[demo] shade summary:")
    shade.orderBy("site").show()

    val shifts = TimeShift.detect(spark, fleet, "site", "ts", "power", slotsPerDay = 48)
    val nShifted = shifts.filter(col("roll_slots") =!= 0).count()
    println(s"[demo] days with detected clock shift: $nShifted")
    spark.stop()
  }
}
