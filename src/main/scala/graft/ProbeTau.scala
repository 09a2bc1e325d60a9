package graft

import org.apache.spark.sql.functions._

/** Same-JVM A/B probe for the SCSF fit lane (optimization round 13):
  * times the 3-tau estimateAndDetect form against the single-tau
  * estimateSingle form, and the fused undilate2 PI against the
  * two-branch join form, interleaved in one session so JIT/host drift
  * cancels. Usage: runMain graft.ProbeTau [sfDir]
  */
object ProbeTau {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = GraftSession.local()
    val ev = graft.sources.Tables.events(spark, dir)
      .select(col("user_id").as("site"), col("ts"), col("value"))
    val dil = graft.operators.Dilation.dilate(spark, ev, "site", "ts", "value", 40)

    def time(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[probetau] $label ${(System.nanoTime() - t0) / 1e9}%.3f s ($n rows)")
    }
    (1 to 3).foreach { rep =>
      System.gc()
      time(s"fit3tau rep$rep") {
        graft.analyses.Quantiles.estimateAndDetect(spark, dil, 40, tauHi = 0.9).count()
      }
      System.gc()
      time(s"fit1tau rep$rep") {
        graft.analyses.Quantiles.estimateSingle(spark, dil, 40, tau = 0.9).count()
      }
    }

    // PI surface: the round-12 two-branch join form vs the fused
    // undilate2 form (both over the SAME single-tau fit, so this
    // isolates the undilate fusion from the tau change)
    val dh = new DataHandler(ev, "site", "ts", "value")
    val rs = graft.operators.Dilation.riseSetTable(ev, "site", "ts", "value")
    def oldPi(): Long = {
      val fit = dh.fitStatisticalClearSky(0.9, 40)
      def und(c: org.apache.spark.sql.Column, as: String) =
        graft.operators.Dilation.undilate(
          spark, fit.select(col("site"), col("day"), col("dil_slot"), c.as("dil_value")),
          rs, 288)
          .groupBy(col("site"), col("day"))
          .agg(sum(col("value")).as(as))
      und(col("dil_value"), "measured_energy")
        .join(und(col("scsf"), "clear_energy"), Seq("site", "day"))
        .withColumn("scsf_pi", try_divide(col("measured_energy"), col("clear_energy")))
        .count()
    }
    (1 to 3).foreach { rep =>
      System.gc()
      time(s"pi2branch rep$rep")(oldPi())
      System.gc()
      time(s"pifused rep$rep")(dh.scsfPerformanceIndex(0.9, 40).count())
    }
    spark.stop()
  }
}
