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
  * Each point is the MEDIAN of three gc-quiesced passes bracketed by
  * combined host-health readings ([[Bench.health]]: FP cycles AND
  * memory-bandwidth triad — round 12 proved a cycles-only bracket
  * passes bandwidth-stolen fleet lanes) — the
  * artifact proves on its face whether the curve was measured on a
  * quiet host (the first cut of this probe took single passes with
  * one before-only calibration and shipped a 16-site point 6× its
  * warm cost: half-JIT'd solver lanes + a co-tenant burst the
  * calibration never saw). Warmup is THREE full 16-site runs — the
  * per-site solver lanes need several executions before C2 has the
  * hot loops (the round-6 code-cache lesson).
  *
  * Run with `SPARK_DRIVER_MEM=24g` — the 252M-row fleet persists
  * MEMORY_AND_DISK and spills past the default 8g heap.
  * Persists bench/history/scale10x_<stamp>.json.
  */
object BenchScale10x {
  def main(args: Array[String]): Unit = {
    val scales = if (args.nonEmpty) args.map(_.toInt).toSeq else Seq(16, 64, 160)
    val spark = GraftSession.local()
    (1 to 3).foreach(_ => Bench.pipelineScaleRun(spark, 16)) // plan + JIT warm at full row grain
    // a degraded point (either calibration reading past the gate)
    // retries after a backoff — same policy as Bench's lane close; if
    // every attempt is degraded the LAST ships, honestly flagged
    val points = scales.map { n =>
      var attempt = 0
      var out: (Int, Long, Double, Double, Bench.HealthReading, Bench.HealthReading, Boolean) = null
      while (attempt < 3 && (out == null || out._7)) {
        attempt += 1
        if (attempt > 1) Thread.sleep(15000L)
        System.gc()
        val hB = Bench.health()
        val (rows, sec) = Bench.pipelineScaleMed3(spark, n)
        val hA = Bench.health()
        val rps = rows / sec
        val degraded = !(hB.clean && hA.clean)
        println(f"[scale10x] sites=$n attempt=$attempt rows=$rows sec=$sec%.2f rows/s=$rps%.0f " +
          s"cal=${hB.render} / ${hA.render} degraded=$degraded")
        out = (n, rows, sec, rps, hB, hA, degraded)
      }
      out
    }
    val base = points.head._4
    val json = points.map { case (n, rows, sec, rps, hB, hA, degraded) =>
      f"""{"sites":$n,"rows":$rows,"sec":$sec%.3f,"rows_per_sec":$rps%.0f,""" +
        f""""rps_vs_base":${rps / base}%.3f,"cal_before_sec":${hB.fp}%.4f,""" +
        f""""cal_after_sec":${hA.fp}%.4f,"bw_before_sec":${hB.bw}%.4f,""" +
        f""""bw_after_sec":${hA.bw}%.4f,"degraded":$degraded}"""
    }.mkString("[", ",", "]")
    val line = s"""{"kind":"pipeline_scale_10x","reps_per_point":3,"points":$json,""" +
      s""""calibration_pinned_sec":${Bench.CalibrationPinnedSec},""" +
      s""""bw_pinned_sec":${Bench.BwPinnedSec}}"""
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
