package graft

import graft.solvers.Kernels

/** Dev utility: sweep tvSeasonalTrendFit hyper-parameters against a
  * reference signal-decomposition fixture.
  * args: [fixtureBase] [hatKey] [seasKey] [l1(0/1)] [harmonics]
  */
object DecompProbe {
  def main(args: Array[String]): Unit = {
    val base = if (args.nonEmpty) args(0) else "test_l2_l1d1_l2d2p365_default"
    val hatKey = if (args.length > 1) args(1) else "expected_s_hat_365"
    val seasKey = if (args.length > 2) args(2) else "expected_s_seas_365"
    val l1 = args.length > 3 && args(3) == "1"
    val h = if (args.length > 4) args(4).toInt else 3
    val dir = "/root/reference/tests/fixtures/signal_decompositions"
    def arr(path: String, key: String): Array[Double] = {
      val src = scala.io.Source.fromFile(path)
      val txt = try src.mkString finally src.close()
      val i0 = txt.indexOf("\"" + key + "\"")
      val lb = txt.indexOf('[', i0)
      val rb = txt.indexOf(']', lb)
      txt.substring(lb + 1, rb).split(",").map(_.trim.toDouble)
    }
    val y = arr(s"$dir/${base}_input.json", "test_signal")
    val expHat = arr(s"$dir/${base}_output.json", hatKey)
    val expSeas = arr(s"$dir/${base}_output.json", seasKey)
    val t = Array.tabulate(y.length)(_.toDouble)
    def mae(a: Array[Double], b: Array[Double]): Double =
      a.indices.map(i => math.abs(a(i) - b(i))).sum / a.length
    val smooth = if (args.length > 5) args(5).toDouble else 0.0
    for (lam <- Seq(0.2, 0.5, 1.0, 2.0, 5.0, 10.0)) {
      val (pwc, seasF, trend) = Kernels.tvSeasonalTrendFit(y, t, lambdaTv = lam, harmonics = h, period = 365.0, l1Residual = l1, seasSmooth = smooth)
      val seas = seasF.indices.map(i => seasF(i) + trend(i)).toArray
      val sm = seas.sum / seas.length
      val stepLocs = (0 until pwc.length - 1).filter(i => math.abs(pwc(i + 1) - pwc(i)) > 0.05)
        .map(i => f"$i:${pwc(i + 1) - pwc(i)}%.2f")
      println(f"lam=$lam%6.1f h=$h l1=$l1 mHat=${mae(pwc.map(_ + sm), expHat)}%.4f mSeas=${mae(seas.map(_ - sm), expSeas)}%.4f steps=${stepLocs.length} ${stepLocs.take(6).mkString(",")} pwcRange=[${pwc.min}%.3f,${pwc.max}%.3f]")
    }
  }
}
