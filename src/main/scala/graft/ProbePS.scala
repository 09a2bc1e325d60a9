package graft

import org.apache.spark.sql.functions._

/** Dev utility: pipeline_scale stage timings (the bench headline).
  * The .rdd lane is the honest cost: a DataFrame count() column-
  * prunes the per-row signal work.
  *
  * Round-11: times the PERSISTED fleet (what pipelineScaleLine
  * measures) component by component, so the delta vs the round-9
  * number (no smoothness channel, no third quantile fit) is
  * attributable: capacity percentile pass, day aggregate without
  * smoothness, fused dayRows with smoothness, full run.
  */
object ProbePS {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local()
    import spark.implicits._
    def tm(name: String)(f: => Any): Double = {
      val a = System.nanoTime(); val n = f; val b = System.nanoTime()
      val s = (b - a) / 1e9
      println(f"[ps] $name%-34s $s%8.3f s ($n)")
      s
    }
    val df = graft.sources.Synth.pvFleet(spark, 16, nDays = 1095, slotsPerDay = 1440)
      .select(col("site"), col("ts"), col("power"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    df.count()
    (1 to 3).foreach { pass =>
      println(s"[ps] -- pass $pass (fleet16 persisted, 25.2M rows) --")
      tm("cache scan (count)")(df.count())
      tm("capacity p95 agg .rdd")(
        graft.operators.DayStats.capacity(df, "site", "power").rdd.count())
      // day agg with the percentile pass replaced by a constant:
      // isolates the group-by cost from the capacity pass
      tm("day agg .rdd (const capacity)") {
        val h = graft.operators.TimeAxis.hourOfDay(col("ts"))
        df.withColumn("capacity", lit(1.0))
          .groupBy(col("site"), to_date(col("ts")).as("day"))
          .agg(
            (sum(col("power")) * 24.0 / count(lit(1))).as("energy"),
            avg(when(col("power") > col("capacity") * 0.02, 1.0).otherwise(0.0)).as("density"),
            max(col("power")).as("daily_max"),
            coalesce(try_divide(sum(h * col("power")), sum(col("power"))), lit(Double.NaN)).as("com_hour"),
            count(col("power")).as("n_obs"),
            first(col("capacity")).as("capacity"))
          .rdd.count()
      }
      tm("dayStats .rdd (no smoothness)")(
        graft.analyses.Pipeline.dayStats(df, "site", "ts", "power")
          .rdd.count())
      tm("dayRows .rdd (true cost)")(
        graft.analyses.Pipeline.dayRows(df, "site", "ts", "power")
          .as[(Long, Double, Double, Double, Double, Double, Long, Double, Double)].rdd.count())
      tm("Pipeline.run")(graft.analyses.Pipeline.run(spark, df, "site", "ts", "power").count())
    }
    println("[ps] " + Bench.pipelineScaleLine(spark))
    spark.stop()
  }
}
