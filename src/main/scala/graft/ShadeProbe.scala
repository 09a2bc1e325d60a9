package graft

import org.apache.spark.sql.functions._

/** Dev utility: stage-by-stage timing of the p04 PCA-shade path. */
object ShadeProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = GraftSession.local()
    import graft.sources.Tables

    def tm(name: String)(f: => Long): Unit = {
      val a = System.nanoTime(); val n = f; val b = System.nanoTime()
      println(f"[probe] $name%-24s ${(b - a) / 1e9}%.3f s ($n rows)")
    }
    val ev = () => Tables.events(spark, sfDir).select(col("user_id").as("site"), col("ts"), col("value"))
    (1 to 2).foreach { pass =>
      println(s"[probe] -- pass $pass --")
      val dil = () => graft.operators.Dilation.dilate(spark, ev(), "site", "ts", "value", nBins = 40, thresholdFrac = 0.01)
      tm("dilate")(dil().count())
      tm("perSlot median")(dil().groupBy(col("site"), col("dil_slot"))
        .agg(percentile(col("dil_value"), lit(0.5)).as("med_v")).count())
      tm("pcaShade")(graft.analyses.Shade.pcaShade(spark, dil(), nBins = 40, k = 2).count())
      tm("p04 full")(graft.analyses.Shade.siteSummary(graft.analyses.Shade.pcaShade(spark, dil(), nBins = 40, k = 2)).count())
    }
    spark.stop()
  }
}
