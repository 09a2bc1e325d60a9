package graft

/** Dev utility: CPU-profile the per-site solver stages of
  * [[graft.analyses.Pipeline.analyzeSite]] off-Spark (driver-side,
  * synthetic day series) to separate solver cost from plan overhead.
  */
object ProfOne {
  def main(args: Array[String]): Unit = {
    val nDays = if (args.nonEmpty) args(0).toInt else 270
    val nSites = if (args.length > 1) args(1).toInt else 32
    def mkSite(seed: Int): Array[graft.analyses.DayRow] =
      Array.tabulate(nDays) { d =>
        val season = 6.0 + 2.0 * math.sin(2 * math.Pi * d / 365.0)
        val noise = math.sin(d * 12.9898 + seed) * 0.8
        graft.analyses.DayRow(seed.toLong, d.toDouble, math.max(season + noise, 0.1),
          0.9 + 0.1 * math.sin(d * 0.7),
          math.max(season / 6.0 + noise * 0.05, 0.05), 12.0 + 0.2 * math.sin(d * 0.3), 288L, 1.0,
          // synthetic intra-day roughness: variable days rough
          math.abs(noise) * 5.0 + 0.5)
      }
    // warmup
    graft.analyses.Pipeline.analyzeSite(0L, mkSite(0))
    val t0 = System.nanoTime()
    (1 to nSites).foreach(s => graft.analyses.Pipeline.analyzeSite(s.toLong, mkSite(s)))
    val dt = (System.nanoTime() - t0) / 1e9
    println(f"[prof] $nSites sites x $nDays days: $dt%.3f s total, ${dt / nSites * 1000}%.1f ms/site")

    // per-kernel breakdown on one site
    import graft.solvers.{Cluster, Kernels}
    val days = mkSite(1)
    val t = days.map(_.dayIdx)
    val energy = days.map(_.energy)
    val density = days.map(_.density)
    val dailyMax = days.map(_.dailyMax)
    val comHour = days.map(_.comHour)
    def tm(name: String)(f: => Any): Unit = {
      val a = System.nanoTime(); f; val b = System.nanoTime()
      println(f"[prof]   $name%-18s ${(b - a) / 1e6}%.1f ms")
    }
    tm("qff x3") { (1 to 3).foreach(_ => Kernels.quantileFourierFit(energy, t, 0.9, 2, 7.0)) }
    tm("cdfPwlFit") { Kernels.cdfPwlFit(dailyMax.sorted, lambdaD2 = 100.0) }
    tm("dbscan") { Cluster.dbscan2d(density, dailyMax, 0.06, 3) }
    tm("optimizeTvWeight") { Kernels.optimizeTvWeight(dailyMax.map(v => math.log(math.max(v, 1e-6))), t, Array(2.0, 5.0, 15.0), 1, 7.0, l1Residual = true) }
    tm("tvSeasonalFit") { Kernels.tvSeasonalFit(comHour, t, 10.0, 1, 7.0) }
    tm("soiling x1") { Kernels.soilingSeparation(energy, t, 7.0, 2) }
    tm("soiling x8 (MC)") { (1 to 8).foreach(_ => Kernels.soilingSeparation(energy, t, 7.0, 2)) }
    var mcN = 0
    tm("mc full") { mcN = Kernels.mcDegradationRate(energy, t, seed = 1L, period = 7.0, harmonics = 2)._2 }
    println(s"[prof]   mc samples drawn:  $mcN")
  }
}
