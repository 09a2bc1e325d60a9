package graft

import org.apache.spark.sql.functions._

/** Dev utility: pipeline_scale stage timings (the bench headline).
  * The .rdd lane is the honest cost: a DataFrame count() column-
  * prunes the per-row signal work.
  */
object ProbePS {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local()
    import spark.implicits._
    def tm(name: String)(f: => Any): Unit = {
      val a = System.nanoTime(); val n = f; val b = System.nanoTime()
      println(f"[ps] $name%-34s ${(b - a) / 1e9}%8.3f s ($n)")
    }
    val df = () => graft.sources.Synth.pvFleet(spark, 16, nDays = 1095, slotsPerDay = 1440)
      .select(col("site"), col("ts"), col("power"))
    (1 to 2).foreach { pass =>
      println(s"[ps] -- pass $pass (fleet16, 25.2M rows) --")
      tm("dayRows .rdd (true cost)")(
        graft.analyses.Pipeline.dayRows(df(), "site", "ts", "power")
          .as[(Long, Double, Double, Double, Double, Double, Long, Double, Double)].rdd.count())
      tm("Pipeline.run")(graft.analyses.Pipeline.run(spark, df(), "site", "ts", "power").count())
    }
    println("[ps] " + Bench.pipelineScaleLine(spark))
    spark.stop()
  }
}
