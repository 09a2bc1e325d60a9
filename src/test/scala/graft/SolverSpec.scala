package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.solvers.{Kernels, Linalg}

/** Kernel tests on synthetic signals — tolerance regime mirrors the
  * reference's own solver tests (MAE ≈ 1e-3…1e-1 depending on stage;
  * `tests/solardatatools/test_signal_decompositions.py:56-60`).
  */
class SolverSpec extends AnyFunSuite {

  test("solveSpd solves a known SPD system") {
    val a = Array(4.0, 1.0, 1.0, 3.0)
    val b = Array(1.0, 2.0)
    val x = Linalg.solveSpd(a, b, 2)
    assert(math.abs(4 * x(0) + x(1) - 1.0) < 1e-9)
    assert(math.abs(x(0) + 3 * x(1) - 2.0) < 1e-9)
  }

  test("solveBandedSpd matches dense solve on a tridiagonal system") {
    val n = 50
    val diag = Array.fill(n)(4.0)
    val off = Array.fill(n)(-1.0)
    val b = Array.tabulate(n)(i => math.sin(i * 0.1))
    val x = Linalg.solveBandedSpd(Array(diag, off), b)
    // residual check
    var maxRes = 0.0
    for (i <- 0 until n) {
      var r = 4.0 * x(i) - b(i)
      if (i > 0) r -= x(i - 1)
      if (i < n - 1) r -= x(i + 1)
      maxRes = math.max(maxRes, math.abs(r))
    }
    assert(maxRes < 1e-8)
  }

  test("quantileFourierFit recovers a seasonal median under noise") {
    val n = 365
    val t = Array.tabulate(n)(_.toDouble)
    val truth = t.map(d => 5.0 + 2.0 * math.sin(2 * math.Pi * d / Kernels.YearPeriod))
    val rng = new scala.util.Random(42)
    val y = truth.map(v => v + rng.nextGaussian() * 0.3)
    val fit = Kernels.quantileFourierFit(y, t, tau = 0.5)
    val mae = t.indices.map(i => math.abs(fit(i) - truth(i))).sum / n
    assert(mae < 0.15, s"MAE $mae")
  }

  test("quantileFourierFit tau=0.9 sits above tau=0.1") {
    val n = 200
    val t = Array.tabulate(n)(_.toDouble)
    val rng = new scala.util.Random(7)
    val y = t.map(_ => 10.0 + rng.nextGaussian())
    val hi = Kernels.quantileFourierFit(y, t, tau = 0.9, harmonics = 1)
    val lo = Kernels.quantileFourierFit(y, t, tau = 0.1, harmonics = 1)
    assert(t.indices.forall(i => hi(i) > lo(i)))
    val spread = t.indices.map(i => hi(i) - lo(i)).sum / n
    assert(spread > 1.0 && spread < 4.0, s"spread $spread")
  }

  test("tvSeasonalFit recovers a step change") {
    val n = 300
    val t = Array.tabulate(n)(_.toDouble)
    val rng = new scala.util.Random(1)
    val y = t.map { d =>
      val step = if (d < 150) 10.0 else 7.0
      step + 0.5 * math.sin(2 * math.Pi * d / 30.0) + rng.nextGaussian() * 0.1
    }
    val (pwc, _) = Kernels.tvSeasonalFit(y, t, lambdaTv = 5.0, harmonics = 3, period = 30.0)
    val left = pwc.slice(20, 130).sum / 110
    val right = pwc.slice(170, 280).sum / 110
    assert(math.abs(left - right) > 2.0, s"left $left right $right")
  }

  test("tvSeasonalFit sumCard keeps jumps unshrunk and flattens segments (reference sum_card path)") {
    // the reference's nonconvex sum_card formulation
    // (_osd_signal_decompositions.py:85-104, convex-warm-started at
    // data_handler.py:1356-1405): same fixture structure as its
    // l2_l1d1_l2d2p365 tests — seasonal + piecewise-constant with two
    // known steps — asserting the property SumCard buys over SumAbs:
    // kept jumps pay no shrinkage, flat segments are exactly flat.
    val n = 400
    val t = Array.tabulate(n)(_.toDouble)
    val rng = new scala.util.Random(7)
    def level(d: Double): Double = if (d < 150) 10.0 else if (d < 280) 7.5 else 9.0
    val y = t.map { d =>
      level(d) + 0.6 * math.sin(2 * math.Pi * d / 30.0) + rng.nextGaussian() * 0.08
    }
    val (pwcCvx, _) = Kernels.tvSeasonalFit(y, t, lambdaTv = 20.0, harmonics = 3, period = 30.0)
    val (pwcCard, sCard) =
      Kernels.tvSeasonalFit(y, t, lambdaTv = 20.0, harmonics = 3, period = 30.0, sumCard = true)
    assert(sCard.length == n && pwcCard.length == n)

    // each segment's recovered level is unshrunk (within noise of truth)
    val segs = Seq((10, 140, 10.0), (160, 270, 7.5), (290, 390, 9.0))
    segs.foreach { case (a, b, truth) =>
      val m = pwcCard.slice(a, b).sum / (b - a)
      assert(math.abs(m - truth) < 0.1, s"segment [$a,$b) mean $m vs $truth")
    }
    // cardinality: exactly the true breakpoints survive (2 jumps)
    val jumps = (0 until n - 1).count(i => math.abs(pwcCard(i + 1) - pwcCard(i)) > 1e-9)
    assert(jumps == 2, s"expected 2 jumps, got $jumps")
    // within-segment flatness is EXACT (piecewise-constant refit), which
    // the convex TV solution does not achieve
    val flatCard = pwcCard.slice(20, 120).distinct.length
    assert(flatCard == 1, s"sumCard segment not exactly flat: $flatCard levels")
    val cvxJumps = (0 until n - 1).count(i => math.abs(pwcCvx(i + 1) - pwcCvx(i)) > 1e-9)
    assert(cvxJumps > jumps, s"convex TV should wiggle more ($cvxJumps) than sumCard ($jumps)")
  }

  test("optimizeTvWeight picks from the grid and still finds the step") {
    val n = 300
    val t = Array.tabulate(n)(_.toDouble)
    val rng = new scala.util.Random(5)
    val y = t.map { d =>
      (if (d < 150) 10.0 else 7.0) + rng.nextGaussian() * 0.1
    }
    val weights = Array(1.0, 5.0, 25.0)
    val (w, pwc, s) = Kernels.optimizeTvWeight(y, t, weights, harmonics = 1, period = 30.0)
    assert(weights.contains(w))
    assert(pwc.length == n && s.length == n)
    val left = pwc.slice(20, 130).sum / 110
    val right = pwc.slice(170, 280).sum / 110
    assert(math.abs(left - right) > 2.0, s"w=$w left $left right $right")
  }

  test("tvSeasonalFit with l1 residual shrugs off outlier days") {
    val n = 200
    val t = Array.tabulate(n)(_.toDouble)
    val rng = new scala.util.Random(11)
    val y = t.map { d => (if (d < 100) 10.0 else 8.0) + rng.nextGaussian() * 0.05 }
    // outage outliers
    y(30) = 0.0; y(31) = 0.0; y(150) = 0.0
    val (pwcL1, _) = Kernels.tvSeasonalFit(y, t, lambdaTv = 5.0, harmonics = 1, period = 7.0, l1Residual = true)
    val left = pwcL1.slice(10, 90).sum / 80
    val right = pwcL1.slice(110, 190).sum / 80
    assert(math.abs(left - 10.0) < 0.2, s"left $left")
    assert(math.abs(right - 8.0) < 0.2, s"right $right")
    // the outlier days should not drag their neighborhood down much
    assert(pwcL1(32) > 9.0, s"post-outlier pwc ${pwcL1(32)}")
  }

  test("cdfPwlFit pins endpoints and smooths curvature") {
    val n = 100
    val rng = new scala.util.Random(3)
    val y = Array.tabulate(n)(i => i / 99.0 + rng.nextGaussian() * 0.01)
    val fit = Kernels.cdfPwlFit(y, lambdaD2 = 50.0)
    assert(math.abs(fit(0) - y(0)) < 1e-3)
    assert(math.abs(fit(n - 1) - y(n - 1)) < 1e-3)
    val rough = (2 until n).map(i => math.abs(fit(i) - 2 * fit(i - 1) + fit(i - 2))).sum
    val origRough = (2 until n).map(i => math.abs(y(i) - 2 * y(i - 1) + y(i - 2))).sum
    assert(rough < origRough / 2, s"rough $rough vs $origRough")
  }

  test("soilingSeparation recovers sawtooth soiling and degradation rate") {
    val n = 365
    val t = Array.tabulate(n)(_.toDouble)
    val rng = new scala.util.Random(21)
    val trueRate = -2e-4
    val trueSoil = t.map(d => 1.0 - 0.12 * ((d % 30) / 30.0)) // wash every 30 days
    val energy = t.indices.map { i =>
      val seasonal = 1.0 + 0.2 * math.sin(2 * math.Pi * t(i) / Kernels.YearPeriod)
      50.0 * seasonal * math.exp(trueRate * t(i)) * trueSoil(i) * (1.0 + rng.nextGaussian() * 0.01)
    }.toArray
    val (soil, rate, _) = Kernels.soilingSeparation(energy, t)
    assert(math.abs(rate - trueRate) < 1.5e-4, s"rate $rate vs $trueRate")
    // recovered soiling correlates strongly with the truth
    val ms = soil.sum / n
    val mt = trueSoil.sum / n
    val cov = t.indices.map(i => (soil(i) - ms) * (trueSoil(i) - mt)).sum
    val corr = cov / math.sqrt(
      t.indices.map(i => math.pow(soil(i) - ms, 2)).sum *
        t.indices.map(i => math.pow(trueSoil(i) - mt, 2)).sum)
    assert(corr > 0.6, s"soiling correlation $corr")
    assert(soil.forall(v => v <= 1.0 + 1e-9 && v > 0.5))
  }

  test("viterbi2 labels sustained clear periods and rejects noise spikes") {
    val ratio = Array.fill(20)(1.0) ++ Array.fill(20)(0.4) ++ Array.fill(20)(1.02)
    val path = Kernels.viterbi2(ratio)
    assert(path.take(20).count(identity) >= 18)
    assert(path.slice(20, 40).count(identity) <= 2)
    assert(path.drop(40).count(identity) >= 18)
  }

  test("tvSeasonalTrendFit separates a capacity step, a linear drift, and seasonality") {
    // ≥2 year-periods: with a shorter span the Fourier basis, trend,
    // and step are near-collinear and no solver can attribute them
    val n = 800
    val t = Array.tabulate(n)(_.toDouble)
    val rng = new scala.util.Random(3)
    val y = Array.tabulate(n) { i =>
      val step = if (i < 400) 10.0 else 8.0                    // −20% capacity change
      val drift = -0.002 * i                                   // slow degradation
      val seas = 0.4 * math.sin(2 * math.Pi * i / 365.2425)
      step + drift + seas + 0.05 * rng.nextGaussian()
    }
    val (pwc, seasonal, trend) = Kernels.tvSeasonalTrendFit(y, t, lambdaTv = 5.0)
    // the step lands in the pwc component...
    val stepEst = pwc.slice(420, 780).sum / 360 - pwc.slice(20, 380).sum / 360
    assert(math.abs(stepEst - (-2.0)) < 0.3, s"step $stepEst vs -2.0")
    // ...the drift in the trend (NOT as a pwc staircase)...
    val slopeEst = (trend.last - trend.head) / (n - 1)
    assert(math.abs(slopeEst - (-0.002)) < 0.0005, s"slope $slopeEst vs -0.002")
    // ...and the seasonal amplitude survives intact
    val seasAmp = seasonal.max - seasonal.min
    assert(math.abs(seasAmp - 0.8) < 0.2, s"seasonal amplitude $seasAmp")
  }

  test("isotonicDecreasing projects onto monotone non-increasing exactly (PAVA)") {
    val y = Array(5.0, 6.0, 4.0, 4.5, 3.0, 3.5, 1.0)
    val f = Kernels.isotonicDecreasing(y)
    // monotone
    assert(f.sliding(2).forall(p => p(0) >= p(1) - 1e-12))
    // block means preserved: total sum matches
    assert(math.abs(f.sum - y.sum) < 1e-9)
    // violating pairs pooled to their mean
    assert(math.abs(f(0) - 5.5) < 1e-9 && math.abs(f(1) - 5.5) < 1e-9)
    // already-monotone input is a fixed point
    val mono = Array(9.0, 7.0, 7.0, 2.0)
    assert(Kernels.isotonicDecreasing(mono).sameElements(mono))
  }

  test("pvproDecompose separates monotone degradation from seasonal") {
    val n = 730
    val t = Array.tabulate(n)(_.toDouble)
    val trueTrend = Array.tabulate(n)(i => 10.0 - 1.5 * i / n) // −15%/period
    val trueSeas = Array.tabulate(n)(i => 0.6 * math.sin(2 * math.Pi * i / 365.2425))
    val rng = new scala.util.Random(7)
    val y = Array.tabulate(n)(i => trueTrend(i) + trueSeas(i) + 0.05 * rng.nextGaussian())
    val (trend, seasonal) = Kernels.pvproDecompose(y, t)
    assert(trend.sliding(2).forall(p => p(0) >= p(1) - 1e-12), "trend not monotone")
    val dropEst = trend.head - trend.last
    assert(math.abs(dropEst - 1.5) < 0.3, s"estimated drop $dropEst")
    // MAE well under the 0.6 seasonal amplitude (trend/seasonal split
    // is not unique at the margins — PAVA steps absorb some slope)
    val seasErr = seasonal.indices.map(i => math.abs(seasonal(i) - trueSeas(i))).sum / n
    assert(seasErr < 0.2, s"seasonal MAE $seasErr")
  }

  test("topEigen recovers the dominant eigenpairs of a small SPD matrix") {
    // G = 5 u uᵀ + 2 v vᵀ with orthonormal u, v
    val u = Array(0.6, 0.8, 0.0)
    val v = Array(-0.8, 0.6, 0.0)
    val g = Array.tabulate(3, 3)((i, j) => 5.0 * u(i) * u(j) + 2.0 * v(i) * v(j))
    val eig = Kernels.topEigen(g, 2)
    assert(math.abs(eig(0)._1 - 5.0) < 1e-6 && math.abs(eig(1)._1 - 2.0) < 1e-6)
    val dot0 = math.abs(eig(0)._2.zip(u).map { case (a, b) => a * b }.sum)
    val dot1 = math.abs(eig(1)._2.zip(v).map { case (a, b) => a * b }.sum)
    assert(dot0 > 0.9999 && dot1 > 0.9999)
  }

  test("topEigen on a rank-deficient matrix returns only unit-norm eigenpairs") {
    // G = [[1,-1],[-1,1]]: rank 1, and the deterministic start vector
    // (1+diag) = (2,2) lies exactly in the null space — the degenerate
    // case must yield NO junk pair, not an unnormalized start vector
    val g = Array(Array(1.0, -1.0), Array(-1.0, 1.0))
    val eig = Kernels.topEigen(g, 2)
    eig.foreach { case (lambda, vec) =>
      val nrm = math.sqrt(vec.map(x => x * x).sum)
      assert(math.abs(nrm - 1.0) < 1e-9, s"non-unit eigenvector (|v|=$nrm) for λ=$lambda")
    }
    assert(eig.length <= 1, s"rank-1 matrix returned ${eig.length} pairs")
    // identity: rank exhausts after n pairs at most, all unit-norm
    val id = Array.tabulate(3, 3)((i, j) => if (i == j) 1.0 else 0.0)
    Kernels.topEigen(id, 3).foreach { case (_, vec) =>
      assert(math.abs(math.sqrt(vec.map(x => x * x).sum) - 1.0) < 1e-9)
    }
  }

  test("mcDraw contract: mcDegradationRate's stream is reproducible and well-formed") {
    val n = 24
    val nHold = 6
    // same seed → identical stream; the MC sampler's whole randomness
    // contract is this sequence (q74 gates it cross-engine)
    val a = Kernels.mcDrawStream(42L, n, 0.25, 5)
    val b = Kernels.mcDrawStream(42L, n, 0.25, 5)
    assert(a.zip(b).forall { case (x, y) =>
      x._1 == y._1 && x._2 == y._2 && x._3 == y._3 && x._4.sameElements(y._4)
    })
    a.foreach { case (_, tau, stf, keep) =>
      assert(tau >= 0.85 && tau < 0.95)
      assert(stf >= 0.1 && stf < 1.0)
      assert(keep.length == n - nHold)
      assert(keep.distinct.length == keep.length)
      assert(keep.sameElements(keep.sorted))
      assert(keep.forall(i => i >= 0 && i < n))
    }
    // a different seed diverges
    val c = Kernels.mcDrawStream(43L, n, 0.25, 5)
    assert(!a.zip(c).forall { case (x, y) => x._2 == y._2 })
    // the extracted draw is exactly what the sampler consumes: a fresh
    // rng replayed draw-by-draw reproduces the stream
    val rng = new scala.util.Random(42L)
    val manual = (0 until 5).map(_ => Kernels.mcDraw(rng, n, nHold))
    assert(a.map(_._2) == manual.map(_._1) && a.map(_._3) == manual.map(_._2))
    assert(a.zip(manual).forall { case (x, m) => x._4.sameElements(m._3) })
  }

  test("soilingRateFit recovers a known log-linear decay at harmonics = 0") {
    val n = 120
    val t = Array.tabulate(n)(_.toDouble)
    // energy = exp(a + b t) with b = -2e-4/day; τ=0.9 envelope of a
    // noiseless series is the series itself
    val y = t.map(tv => math.exp(2.0 - 2e-4 * tv))
    val (rate, iters, beta) = Kernels.soilingRateFit(y, t, tau = 0.9, harmonics = 0, irlsTol = 1e-10)
    assert(math.abs(beta(0) - 2.0) < 1e-3, s"intercept ${beta(0)}")
    assert(math.abs(rate - (-2e-4)) < 1e-5, s"rate $rate")
    // strict: the 1e-10 fixed-point exit must fire BEFORE the 40-cap
    // (iters == 40 would mean the early exit is broken)
    assert(iters < 40, s"early exit never fired (iters=$iters)")
  }

  test("shapleyAttribution is exact: attributions sum to v(all) - v(none)") {
    val baseline = Array(100.0, 110.0, 120.0)
    val factors = Array(
      Array(0.95, 0.95, 0.95), // degradation
      Array(0.9, 1.0, 0.8), // soiling
      Array(1.0, 0.7, 1.0), // weather
      Array(1.0, 1.0, 0.0) // outage
    )
    val attr = Kernels.shapleyAttribution(baseline, factors)
    val vAll = baseline.indices.map(i => baseline(i) * factors.map(_(i)).product).sum
    val vNone = baseline.sum
    assert(math.abs(attr.sum - (vAll - vNone)) < 1e-9)
    assert(attr.forall(_ <= 0.0)) // all factors are losses here
  }

  test("seasonalQuantileTrend tracks the smooth seasonal component through spiky outliers") {
    val n = 180
    // seasonal baseline + sparse large positive spikes (the cloudy-day
    // quantile excursions the pinball loss must shrug off)
    val base = Array.tabulate(n)(d => 10.0 + 4.0 * math.sin(2 * math.Pi * d / 365.0))
    val y = base.zipWithIndex.map { case (b, d) => if (d % 17 == 0) b + 30.0 else b }
    val x = Kernels.seasonalQuantileTrend(y, p1 = 0.5)
    // the heavy D² penalty + median pinball recover the smooth curve:
    // spikes (6% of days, +30) must not drag the trend materially
    val err = base.indices.map(i => math.abs(x(i) - base(i))).max
    assert(err < 1.5, s"max deviation from the seasonal base: $err")
    // the trend is smooth at the penalty scale: second differences tiny
    val d2max = (2 until n).map(i => math.abs(x(i) - 2 * x(i - 1) + x(i - 2))).max
    assert(d2max < 1e-2, s"second differences not smoothed: $d2max")
  }

  test("seasonalQuantileTrend pinball asymmetry: high p1 hugs the upper envelope") {
    val n = 120
    val rnd = new scala.util.Random(7)
    val base = Array.tabulate(n)(d => 5.0 + 2.0 * math.cos(2 * math.Pi * d / 365.0))
    val y = base.map(b => b - rnd.nextDouble() * 3.0) // one-sided noise below
    val hi = Kernels.seasonalQuantileTrend(y, p1 = 0.9)
    val lo = Kernels.seasonalQuantileTrend(y, p1 = 0.1)
    val fracBelowHi = y.indices.count(i => y(i) <= hi(i)).toDouble / n
    val fracBelowLo = y.indices.count(i => y(i) <= lo(i)).toDouble / n
    assert(fracBelowHi > fracBelowLo + 0.3,
      s"quantile ordering violated: $fracBelowLo vs $fracBelowHi")
    assert(hi.indices.forall(i => hi(i) >= lo(i) - 1e-6), "hi trend crossed below lo trend")
  }
}
