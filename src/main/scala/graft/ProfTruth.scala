package graft

import org.apache.spark.sql.functions._

/** Dev utility: debug the ground-truth profiler chain — per-day
  * rise/set/daylight estimates vs geometric truth for one synthetic
  * site.
  */
object ProfTruth {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local("8")
    spark.sparkContext.setLogLevel("ERROR")
    val lat = 33.0; val lon = -118.0; val tilt = 30.0; val az = -25.0; val tz = -8.0
    val df = graft.sources.Synth.pvSites(
      spark, Seq((0L, lat, lon, tilt, az)), nDays = 365, slotsPerDay = 96, utcOffsetHours = tz)
    val est = graft.analyses.SunriseSunset.estimates(spark, df, "site", "ts", "power", 21)
    est.select("site", "day", "sunrise_est", "sunset_est", "plausible", "threshold")
      .orderBy("day").show(10)
    // geometric truth for a few days
    def riseSetTrue(doy: Int): (Double, Double) = {
      val delta = math.toRadians(23.45 * math.sin(2 * math.Pi * (doy + 284.0) / 365.0))
      val ha = math.toDegrees(math.acos(-math.tan(math.toRadians(lat)) * math.tan(delta)))
      val eot = {
        val b = 2 * math.Pi * (doy - 1.0) / 365.0
        229.18 * (0.000075 + 0.001868 * math.cos(b) - 0.032077 * math.sin(b)
          - 0.014615 * math.cos(2 * b) - 0.04089 * math.sin(2 * b))
      }
      val noonClock = 12.0 + tz - lon / 15.0 - eot / 60.0 - tz // local clock noon
      val noonLocal = 12.0 - lon / 15.0 - eot / 60.0 + tz
      (noonLocal - ha / 15.0, noonLocal + ha / 15.0)
    }
    Seq(1, 90, 180, 270).foreach { d =>
      val (sr, ss) = riseSetTrue(d)
      println(f"[truth] doy $d%3d rise $sr%.2f set $ss%.2f daylight ${ss - sr}%.2f")
    }
    // per-threshold holdout errors + mean daylight
    val rg = graft.analyses.SunriseSunset.roughGrid(df, "site", "ts", "power", 21)
      .orderBy("day").collect()
    val nDays = rg.length
    val ths = graft.analyses.SunriseSunset.thresholdGrid(21)
    val srGrid = Array.tabulate(21)(k => rg.map { r =>
      val a = r.getSeq[Any](2); if (a(k) == null) Double.NaN else a(k).asInstanceOf[Double] })
    val ssGrid = Array.tabulate(21)(k => rg.map { r =>
      val a = r.getSeq[Any](3); if (a(k) == null) Double.NaN else a(k).asInstanceOf[Double] })
    val t = Array.tabulate(nDays)(_.toDouble)
    ths.indices.foreach { k =>
      val dl = srGrid(k).zip(ssGrid(k)).collect { case (a, b) if !a.isNaN && !b.isNaN => b - a }
      val mean = if (dl.nonEmpty) dl.sum / dl.length else Double.NaN
      println(f"[grid] th=${ths(k)}%.5f nValid=${dl.length} meanDaylight=$mean%.2f")
    }
    val fit = graft.analyses.SunriseSunset.optimizeSite(srGrid, ssGrid, t, ths)
    println(s"[grid] selected=${fit.thIdx} th=${fit.threshold} hoErr=${fit.hoErr} plausible=${fit.plausible}")
    // replicate the per-threshold holdout error to see the selection
    def isTest(d: Int): Boolean = ((d.toLong * 2654435761L) & 0x7fffffffL) % 100 >= 80
    ths.indices.foreach { k =>
      val sr = srGrid(k); val ss = ssGrid(k)
      val srTrain = Array.tabulate(nDays)(d => if (isTest(d)) Double.NaN else sr(d))
      val ssTrain = Array.tabulate(nDays)(d => if (isTest(d)) Double.NaN else ss(d))
      val srFit = graft.solvers.Kernels.quantileFourierFit(srTrain, t, 0.1, 3, graft.solvers.Kernels.YearPeriod)
      val ssFit = graft.solvers.Kernels.quantileFourierFit(ssTrain, t, 0.9, 3, graft.solvers.Kernels.YearPeriod)
      var sum = 0.0; var m = 0
      (0 until nDays).foreach { d =>
        if (isTest(d)) {
          if (!sr(d).isNaN) { sum += math.abs(sr(d) - srFit(d)); m += 1 }
          if (!ss(d).isNaN) { sum += math.abs(ss(d) - ssFit(d)); m += 1 }
        }
      }
      val plaus = srFit.max - srFit.min > 0.25 && ssFit.max - ssFit.min > 0.25
      println(f"[errs] k=$k%2d th=${ths(k)}%.5f err=${if (m > 0) sum / m else -1.0}%.4f plausible=$plaus srRange=${srFit.max - srFit.min}%.3f ssRange=${ssFit.max - ssFit.min}%.3f")
    }

    val loc = graft.analyses.Profiler.estimateAll(spark, df, "site", "ts", "power",
      gmtOffsetHours = tz)
    loc.show()
    val locRough = graft.analyses.Profiler.estimateAll(spark, df, "site", "ts", "power",
      optimizedLocation = false, gmtOffsetHours = tz)
    locRough.show()
    spark.stop()
  }
}
