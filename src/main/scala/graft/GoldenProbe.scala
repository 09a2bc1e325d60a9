package graft

import graft.solvers.Kernels

/** Dev utility: iterate the cross-basis quantile kernel against the
  * reference's quantile_estimation fixture. args: [ridge] [dailyH] [yearlyH]
  */
object GoldenProbe {
  def main(args: Array[String]): Unit = {
    val ridge = if (args.nonEmpty) args(0).toDouble else 0.1
    val dailyH = if (args.length > 1) args(1).toInt else 8
    val yearlyH = if (args.length > 2) args(2).toInt else 3
    val dir = "/root/reference/tests/fixtures/quantile_estimation"
    val srcSig = scala.io.Source.fromFile(s"$dir/signal_dil.txt")
    val y = try srcSig.getLines().map { s =>
      val v = s.trim; if (v.isEmpty || v == "nan") Double.NaN else v.toDouble
    }.toArray finally srcSig.close()
    val srcQ = scala.io.Source.fromFile(s"$dir/quant_dil_df.csv")
    val lines = try srcQ.getLines().toArray finally srcQ.close()
    val header = lines.head.split(",").map(_.trim)
    val golden = lines.tail.map(_.split(",").map(_.trim))
    val t = Array.tabulate(y.length)(_.toDouble)
    Seq(0.2, 0.5, 0.8).foreach { tau =>
      val ci = header.indexOf(tau.toString)
      val t0 = System.nanoTime()
      val fit = Kernels.quantileCrossFit(y, t, tau, 21.0, dailyH, 365.24225 * 21, yearlyH, ridge)
      val dt = (System.nanoTime() - t0) / 1e9
      val g = golden.map(r => r(ci).toDouble)
      val diffs = y.indices.filterNot(i => y(i).isNaN || fit(i).isNaN)
        .map(i => math.abs(fit(i) - g(i))).sorted
      val med = diffs(diffs.length / 2)
      val p90 = diffs((diffs.length * 0.9).toInt)
      println(f"[golden] tau=$tau ridge=$ridge H=($dailyH,$yearlyH): med $med%.4f p90 $p90%.4f (${dt}%.1f s)")
    }
  }
}
