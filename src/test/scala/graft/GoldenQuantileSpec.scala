package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.solvers.Kernels

/** Golden parity for smooth periodic quantile estimation on the
  * dilated grain (reference `algorithms/quantile_estimation.py:20-94`
  * via `tests/solardatatools/test_quantile_and_dilation.py:44-67`):
  * the fixture provides the reference's own dilated signal
  * (`signal_dil.txt`, 366 days × 21 slots) and the quantiles its
  * solver produced on it (`quant_dil_df.csv`, tau ∈ {0.2, 0.5, 0.8},
  * harmonics [8, 3]). We fit OUR 2-period pinball-IRLS kernel to the
  * same signal and require agreement at the reference test's own
  * decimal=1 scale (it allows per-entry |Δ| up to 0.05 against a
  * CVXPY-class solver; we use median/p90 bands of the same order).
  */
class GoldenQuantileSpec extends AnyFunSuite {

  private val fixtureDir = "/root/reference/tests/fixtures/quantile_estimation"

  test("dilated-grain quantiles track the reference solver's golden output") {
    val srcSig = scala.io.Source.fromFile(s"$fixtureDir/signal_dil.txt")
    val y = try srcSig.getLines().map { s =>
      val v = s.trim; if (v.isEmpty || v == "nan") Double.NaN else v.toDouble
    }.toArray finally srcSig.close()

    val srcQ = scala.io.Source.fromFile(s"$fixtureDir/quant_dil_df.csv")
    val lines = try srcQ.getLines().toArray finally srcQ.close()
    val header = lines.head.split(",").map(_.trim)
    val taus = Seq(0.2, 0.5, 0.8)
    val colIdx = taus.map(tau => header.indexOf(tau.toString))
    assert(colIdx.forall(_ > 0), s"quantile columns missing from ${header.toSeq}")
    val golden = lines.tail.map(_.split(",").map(_.trim))

    assert(golden.length == y.length, s"${golden.length} golden rows vs ${y.length} signal entries")

    val nvalsDil = 21
    val t = Array.tabulate(y.length)(_.toDouble)
    taus.zip(colIdx).foreach { case (tau, ci) =>
      val fit = Kernels.quantileCrossFit(y, t, tau,
        dailyPeriod = nvalsDil.toDouble, dailyH = 8,
        yearlyPeriod = 365.24225 * nvalsDil, yearlyH = 3, ridge = 0.1)
      val g = golden.map(r => r(ci).toDouble)
      val diffs = y.indices.filterNot(i => y(i).isNaN || fit(i).isNaN)
        .map(i => math.abs(fit(i) - g(i))).sorted
      assert(diffs.nonEmpty)
      val med = diffs(diffs.length / 2)
      val p90 = diffs((diffs.length * 0.9).toInt)
      info(f"tau=$tau: median |Δ| $med%.4f, p90 |Δ| $p90%.4f over ${diffs.length} entries")
      // the reference's own test accepts |Δ| ≤ 0.05 per entry against
      // its solver; we hold the median an order of magnitude tighter
      assert(med < 0.01, f"tau=$tau median |Δ| $med%.4f")
      assert(p90 < 0.05, f"tau=$tau p90 |Δ| $p90%.4f")
    }
  }
}
