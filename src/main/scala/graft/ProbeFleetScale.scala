package graft

/** Dev probe: horizontal-scaling curve of the fleet pipeline beyond
  * Bench's fleet16 point (1/16/48/96 synthetic 3-yr 1-min sites on
  * local[32]) — evidence that per-row throughput holds as the fleet
  * axis grows, which is the axis a real cluster scales on.
  */
object ProbeFleetScale {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local()
    def run(nSites: Int): Unit = {
      val df = graft.sources.Synth.pvFleet(spark, nSites, nDays = 1095, slotsPerDay = 1440)
        .select(org.apache.spark.sql.functions.col("site"),
          org.apache.spark.sql.functions.col("ts"),
          org.apache.spark.sql.functions.col("power"))
      val rows = nSites.toLong * 1095L * 1440L
      val t0 = System.nanoTime()
      val n = graft.analyses.Pipeline.run(spark, df, "site", "ts", "power").count()
      val sec = (System.nanoTime() - t0) / 1e9
      require(n == nSites)
      println(f"[fleetscale] sites=$nSites%3d rows=$rows%11d sec=$sec%8.2f rows_per_sec=${rows / sec}%12.0f")
    }
    run(1) // warm plan + JIT
    Seq(1, 16, 48, 96, 192).foreach(run)
    spark.stop()
  }
}
