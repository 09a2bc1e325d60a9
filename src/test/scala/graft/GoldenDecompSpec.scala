package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.solvers.Kernels

/** Golden parity for the signal-decomposition kernels against the
  * reference's own per-solver fixtures
  * (`tests/fixtures/signal_decompositions/test_*_{input,output}.json`,
  * used by `test_signal_decompositions.py` with MAE threshold 1e-3
  * between ITS solvers). Our kernels solve the same objectives with a
  * different parameterization (Fourier seasonal subspace instead of a
  * free 2nd-diff-penalized periodic signal; IRLS instead of
  * interior-point), so parity is asserted as small MAE on the O(1)
  * amplitude fixture signals, not solver-identical output.
  */
class GoldenDecompSpec extends AnyFunSuite {

  private def loadJsonArr(path: String, key: String): Array[Double] = {
    val src = scala.io.Source.fromFile(path)
    val txt = try src.mkString finally src.close()
    // minimal extraction: "key": [v, v, ...]
    val i0 = txt.indexOf("\"" + key + "\"")
    require(i0 >= 0, s"$key not in $path")
    val lb = txt.indexOf('[', i0)
    val rb = txt.indexOf(']', lb)
    txt.substring(lb + 1, rb).split(",").map(_.trim.toDouble)
  }

  private def loadJsonBoolArr(path: String, key: String): Array[Boolean] = {
    val src = scala.io.Source.fromFile(path)
    val txt = try src.mkString finally src.close()
    val i0 = txt.indexOf("\"" + key + "\"")
    require(i0 >= 0, s"$key not in $path")
    val lb = txt.indexOf('[', i0)
    val rb = txt.indexOf(']', lb)
    txt.substring(lb + 1, rb).split(",").map(_.trim.toBoolean)
  }

  private val dir = "/root/reference/tests/fixtures/signal_decompositions"

  private def mae(a: Array[Double], b: Array[Double]): Double =
    a.indices.map(i => math.abs(a(i) - b(i))).sum / a.length

  test("tl1_l2d2p365 default: quantile seasonal fit tracks the fixture") {
    val y = loadJsonArr(s"$dir/test_tl1_l2d2p365_default_input.json", "test_signal")
    val exp = loadJsonArr(s"$dir/test_tl1_l2d2p365_default_output.json", "expected_s_seas_365")
    val t = Array.tabulate(y.length)(_.toDouble)
    val fit = Kernels.quantileFourierFit(y, t, tau = 0.8, harmonics = 3, period = 365.0)
    val m = mae(fit, exp)
    info(f"MAE $m%.4f")
    assert(m < 0.1, f"MAE $m%.4f vs reference solver output")
  }

  /** The fixture is the degenerate hard case for this decomposition:
    * one large step plus a strong yearly seasonal over exactly one
    * period, where the step aliases into the periodic basis. The
    * ALTERNATING fit (`tvSeasonalFit`) converges to a wrong split here
    * (seasonal absorbs ~40% of the step); the JOINT Schur-complement
    * IRLS (`tvSeasonalTrendFit`, the full l1_pwc_smoothper_trend
    * analog run with an ℓ2 residual) resolves it: one step, both
    * components within MAE 0.05 of the reference solver's output.
    */
  test("l2_l1d1_l2d2p365 default: pwc + seasonal components track the fixture") {
    val y = loadJsonArr(s"$dir/test_l2_l1d1_l2d2p365_default_input.json", "test_signal")
    val expHat = loadJsonArr(s"$dir/test_l2_l1d1_l2d2p365_default_output.json", "expected_s_hat_365")
    val expSeas = loadJsonArr(s"$dir/test_l2_l1d1_l2d2p365_default_output.json", "expected_s_seas_365")
    val t = Array.tabulate(y.length)(_.toDouble)
    val (pwc, seasF, trend) = Kernels.tvSeasonalTrendFit(
      y, t, lambdaTv = 1.0, harmonics = 3, period = 365.0, l1Residual = false)
    val seas = seasF.indices.map(i => seasF(i) + trend(i)).toArray
    // component-mean convention: the reference zero-means s_seas and
    // carries the intercept in s_hat; our basis holds the intercept in
    // the pwc but splits slow drift into the trend column — align
    // means before comparing (the decomposition is what's under test)
    val seasMean = seas.sum / seas.length
    val mHat = mae(pwc.map(_ + seasMean), expHat)
    val mSeas = mae(seas.map(_ - seasMean), expSeas)
    val nSteps = pwc.sliding(2).count(p => math.abs(p(1) - p(0)) > 0.05)
    assert(nSteps == 1, s"expected exactly one change point, got $nSteps")
    assert(mHat < 0.1, f"pwc MAE $mHat%.4f vs reference solver output")
    assert(mSeas < 0.1, f"seasonal MAE $mSeas%.4f vs reference solver output")
  }

  test("tl1_l2d2p365 idx_select: masked quantile fit tracks the 2-year fixture") {
    val y = loadJsonArr(s"$dir/test_tl1_l2d2p365_idx_select_input.json", "test_signal")
    val ixs = loadJsonBoolArr(s"$dir/test_tl1_l2d2p365_idx_select_input.json", "indices")
    val exp = loadJsonArr(s"$dir/test_tl1_l2d2p365_idx_select_output.json", "expected_s_seas_ixs")
    val masked = y.indices.map(i => if (ixs(i)) y(i) else Double.NaN).toArray
    val t = Array.tabulate(y.length)(_.toDouble)
    val fit = Kernels.quantileFourierFit(masked, t, tau = 0.8, harmonics = 3, period = 365.0)
    val m = mae(fit, exp)
    info(f"MAE $m%.4f")
    assert(m < 0.1, f"MAE $m%.4f vs reference solver output")
  }

  test("l2_l1d1_l2d2p365 long: 2-year joint decomposition tracks the fixture") {
    val y = loadJsonArr(s"$dir/test_l2_l1d1_l2d2p365_default_long_input.json", "test_signal")
    val expHat = loadJsonArr(s"$dir/test_l2_l1d1_l2d2p365_default_long_output.json", "expected_s_hat")
    val expSeas = loadJsonArr(s"$dir/test_l2_l1d1_l2d2p365_default_long_output.json", "expected_s_seas")
    val t = Array.tabulate(y.length)(_.toDouble)
    val (pwc, seasF, trend) = Kernels.tvSeasonalTrendFit(
      y, t, lambdaTv = 2.0, harmonics = 3, period = 365.0, l1Residual = false)
    val seas = seasF.indices.map(i => seasF(i) + trend(i)).toArray
    val seasMean = seas.sum / seas.length
    val mHat = mae(pwc.map(_ + seasMean), expHat)
    val mSeas = mae(seas.map(_ - seasMean), expSeas)
    info(f"pwc MAE $mHat%.4f seas MAE $mSeas%.4f")
    assert(mHat < 0.1, f"pwc MAE $mHat%.4f vs reference solver output")
    assert(mSeas < 0.1, f"seasonal MAE $mSeas%.4f vs reference solver output")
  }

  /** The reference runs this fixture through `l1_pwc_smoothper_trend`
    * (`signal_decompositions.py:188-226` — ℓ1 residual, pwc +
    * smooth-periodic + trend), i.e. `tvSeasonalTrendFit(l1Residual =
    * true)` with the spcqe-style seasonal ridge. The ℓ1 noise on this
    * fixture is heavy (±0.9 on O(1) components) and the reference
    * polishes with a SINGLE ε=0.1 reweight, so its solution keeps
    * some residual in the components; parity here is the structure —
    * the dominant −2.5 step at day 182 — plus a coarse MAE band, not
    * the tight bound of the ℓ2 cases.
    */
  test("l1_l1d1_l2d2p365 default: l1-residual joint decomposition finds the step") {
    val y = loadJsonArr(s"$dir/test_l1_l1d1_l2d2p365_default_input.json", "test_signal")
    val expHat = loadJsonArr(s"$dir/test_l1_l1d1_l2d2p365_default_output.json", "expected_s_hat_365")
    val expSeas = loadJsonArr(s"$dir/test_l1_l1d1_l2d2p365_default_output.json", "expected_s_seas_365")
    val t = Array.tabulate(y.length)(_.toDouble)
    val (pwc, seasF, trend) = Kernels.tvSeasonalTrendFit(
      y, t, lambdaTv = 5.0, harmonics = 6, period = 365.0, l1Residual = true, seasSmooth = 50.0)
    val seas = seasF.indices.map(i => seasF(i) + trend(i)).toArray
    val seasMean = seas.sum / seas.length
    val mHat = mae(pwc.map(_ + seasMean), expHat)
    val mSeas = mae(seas.map(_ - seasMean), expSeas)
    // dominant step: largest |jump| must sit at day 182 and be a drop
    val jumps = (0 until pwc.length - 1).map(i => (math.abs(pwc(i + 1) - pwc(i)), i, pwc(i + 1) - pwc(i)))
    val (mag, loc, signed) = jumps.max
    info(f"pwc MAE $mHat%.4f seas MAE $mSeas%.4f dominant step $signed%.2f at $loc")
    assert(math.abs(loc - 182) <= 2, s"dominant step at $loc, expected ~182")
    assert(signed < -1.0, f"dominant step $signed%.2f, expected a large drop")
    assert(mHat < 0.3, f"pwc MAE $mHat%.4f vs reference solver output")
    assert(mSeas < 0.2, f"seasonal MAE $mSeas%.4f vs reference solver output")
  }

  test("l2_l1d2 default: piecewise-linear CDF fit tracks the fixture") {
    val y = loadJsonArr(s"$dir/test_l2_l1d2_default_input.json", "test_signal")
    val exp = loadJsonArr(s"$dir/test_l2_l1d2_default_output.json", "expected_y_hat")
    val fit = Kernels.cdfPwlFit(y, lambdaD2 = 5.0)
    val m = mae(fit, exp)
    info(f"MAE $m%.4f")
    assert(m < 0.05, f"MAE $m%.4f vs reference solver output")
  }
}
