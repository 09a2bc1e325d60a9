package graft

/** Dev probe: horizontal-scaling curve of the fleet pipeline beyond
  * Bench's fleet16 point (1/16/48/96/192 synthetic 3-yr 1-min sites on
  * local[32]) — evidence that per-row throughput holds as the fleet
  * axis grows, which is the axis a real cluster scales on.
  *
  * Per-phase split (round-9: the 96-site r8 dip was driver-heap
  * pressure, but WHICH phase degrades was unmeasured): each point
  * times the relational day-stats phase (scan → (site, day) grain)
  * separately from the full pipeline, so the per-site solver stage's
  * share is the difference; JVM GC time and live heap are sampled
  * around the full run so memory pressure is attributed, not guessed.
  * Usage: runMain graft.ProbeFleetScale [nSites ...] (default
  * 1 16 48 96 192).
  */
object ProbeFleetScale {

  private def gcMs(): Long = {
    import scala.jdk.CollectionConverters._
    java.lang.management.ManagementFactory.getGarbageCollectorMXBeans.asScala
      .map(_.getCollectionTime).sum
  }

  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local()
    val sizes = if (args.nonEmpty) args.map(_.toInt).toSeq else Seq(1, 16, 48, 96, 192)
    def run(nSites: Int, label: String = ""): Unit = {
      val df = graft.sources.Synth.pvFleet(spark, nSites, nDays = 1095, slotsPerDay = 1440)
        .select(org.apache.spark.sql.functions.col("site"),
          org.apache.spark.sql.functions.col("ts"),
          org.apache.spark.sql.functions.col("power"))
      val rows = nSites.toLong * 1095L * 1440L
      // phase 1: the relational day-grain aggregation alone
      val tA = System.nanoTime()
      graft.analyses.Pipeline.dayStats(df, "site", "ts", "power").count()
      val secDay = (System.nanoTime() - tA) / 1e9
      // phase 2: the full pipeline (re-derives day stats — the probe
      // wants the production plan, not a persisted shortcut), with GC
      // time and post-run live heap sampled around it
      val gc0 = gcMs()
      val t0 = System.nanoTime()
      val n = graft.analyses.Pipeline.run(spark, df, "site", "ts", "power").count()
      val sec = (System.nanoTime() - t0) / 1e9
      val gcSec = (gcMs() - gc0) / 1e3
      require(n == nSites)
      val rt = Runtime.getRuntime
      val heapMb = (rt.totalMemory() - rt.freeMemory()) / (1024 * 1024)
      val solver = sec - secDay
      println(f"[fleetscale$label] sites=$nSites%3d rows=$rows%11d sec=$sec%8.2f " +
        f"rows_per_sec=${rows / sec}%12.0f daystats_sec=$secDay%7.2f " +
        f"solver_sec=$solver%7.2f gc_sec=$gcSec%6.2f live_heap_mb=$heapMb%6d " +
        f"max_heap_mb=${rt.maxMemory() / (1024 * 1024)}%6d")
    }
    run(sizes.head, label = "-warm") // warm plan + JIT
    sizes.foreach(run(_))
    spark.stop()
  }
}
