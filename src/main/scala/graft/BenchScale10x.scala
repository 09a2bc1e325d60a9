package graft

/** Scale-linearity probe: the full fleet pipeline at 1× / 4× / 10×
  * the fleet16 headline (16 / 64 / 160 synthetic sites, 3 yr @ 1-min
  * each — 25M / 101M / 252M rows), grounding the "would survive
  * 100 TB" posture with a measured curve instead of a plan argument.
  * Every per-site stage (solver lanes, histogram percentile,
  * day-grain aggregates) should hold rows/s roughly flat as sites
  * multiply; a super-linear wall-clock stage is a scale bug and
  * becomes the next round's top item.
  *
  * Each point records a host-health calibration reading
  * ([[Bench.calibrate]]) so the artifact proves on its face the
  * curve was measured on a quiet host. One timed pass per point
  * after a full warm run at 16 sites (the 160-site point costs ~10×
  * the 16-site one; medians come from the committed BenchScale
  * artifacts at the headline scale).
  *
  * Run with `SPARK_DRIVER_MEM=24g` — the 252M-row fleet persists
  * MEMORY_AND_DISK and spills past the default 8g heap.
  * Persists bench/history/scale10x_<stamp>.json.
  */
object BenchScale10x {
  def main(args: Array[String]): Unit = {
    val scales = if (args.nonEmpty) args.map(_.toInt).toSeq else Seq(16, 64, 160)
    val spark = GraftSession.local()
    Bench.pipelineScaleRun(spark, 16) // plan + JIT warm at full row grain
    val points = scales.map { n =>
      System.gc()
      val cal = Bench.calibrate()
      val (rows, sec) = Bench.pipelineScaleRun(spark, n)
      val rps = rows / sec
      println(f"[scale10x] sites=$n rows=$rows sec=$sec%.2f rows/s=$rps%.0f cal=$cal%.4f")
      (n, rows, sec, rps, cal)
    }
    val base = points.head._4
    val json = points.map { case (n, rows, sec, rps, cal) =>
      f"""{"sites":$n,"rows":$rows,"sec":$sec%.3f,"rows_per_sec":$rps%.0f,""" +
        f""""rps_vs_base":${rps / base}%.3f,"calibration_sec":$cal%.4f}"""
    }.mkString("[", ",", "]")
    val line = s"""{"kind":"pipeline_scale_10x","points":$json,""" +
      s""""calibration_pinned_sec":${Bench.CalibrationPinnedSec}}"""
    println(s"[scale10x] $line")
    try {
      val stamp = java.time.format.DateTimeFormatter
        .ofPattern("yyyyMMdd_HHmmss").withZone(java.time.ZoneOffset.UTC)
        .format(java.time.Instant.now())
      val hist = java.nio.file.Paths.get(
        s"bench/history/scale10x_${stamp}_${System.nanoTime() % 1000000L}.json")
      java.nio.file.Files.createDirectories(hist.getParent)
      java.nio.file.Files.writeString(hist, line + "\n",
        java.nio.file.StandardOpenOption.CREATE_NEW)
      println(s"[scale10x] wrote $hist")
    } catch { case scala.util.control.NonFatal(e) =>
      System.err.println(s"[scale10x] could not persist: ${e.getMessage}")
    }
    spark.stop()
  }
}
