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
    println("[demo] shade summary (mirror envelope):")
    shade.orderBy("site").show()

    val pcaShade = Shade.siteSummary(Shade.pcaShade(spark, dil, nBins = 50, k = 2))
    println("[demo] shade summary (fleet-PCA basis):")
    pcaShade.orderBy("site").show()

    val shifts = TimeShift.detect(spark, fleet, "site", "ts", "power", slotsPerDay = 48)
    val nShifted = shifts.filter(col("roll_slots") =!= 0).count()
    println(s"[demo] days with detected clock shift: $nShifted")

    // PVPro-style post-processing of each site's daily energy
    import spark.implicits._
    val daily = fleet.groupBy(col("site"), to_date(col("ts")).as("day"))
      .agg((sum(col("power")) * 24.0 / count(lit(1))).as("energy"))
    val firstDay = daily.groupBy(col("site")).agg(min(col("day")).as("first_day"))
    val trendRows = daily.join(broadcast(firstDay), Seq("site"))
      .select(col("site"), datediff(col("day"), col("first_day")).cast("double").as("t"), col("energy"))
      .as[(Long, Double, Double)]
      .groupByKey(_._1)
      .mapGroups { (siteId, it) =>
        val rows = it.toArray.sortBy(_._2)
        val (trend, _) = graft.solvers.Kernels.pvproDecompose(rows.map(_._3), rows.map(_._2))
        (siteId, if (trend.nonEmpty) trend.head - trend.last else 0.0)
      }
      .toDF("site", "trend_drop")
    println("[demo] PVPro monotone trend drop per site:")
    trendRows.orderBy("site").show()
    spark.stop()
  }
}
