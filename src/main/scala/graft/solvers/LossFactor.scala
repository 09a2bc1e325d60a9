package graft.solvers

/** Loss-factor signal decomposition at FULL reference fidelity — the
  * 5-component log-space model of
  * `algorithms/loss_factor_analysis.py:447-552`:
  *
  *   log(energy) = seasonal + capacity_change + soiling + degradation
  *                 + residual        (on the non-outage mask)
  *
  * with the reference's component structure:
  *  - residual: τ-pinball loss (the "weather" channel, τ = 0.9);
  *  - seasonal: Fourier basis (intercept + `harmonics` pairs, period
  *    365.2425 d) with a ridge `weightSeasonal` on the harmonic
  *    coefficients (gfosd `comp.Fourier`'s smoothness weight);
  *  - soiling: nonpositive, expressed in the reference's SAWTOOTH
  *    DICTIONARY (`loss_factor_analysis.py:759-780` replicated exactly:
  *    a constant −1 column plus, for k = 2..31 and phases {0, π}, the
  *    per-segment slices of a falling sawtooth), L1 on the coefficients
  *    (`weightSoilStiffness`) + L1 on the values
  *    (`weightSoilSparsity`);
  *  - degradation: "linear" (no curvature, first value 0 — a line
  *    through the origin), "nonlinear" (monotone nonincreasing, smooth
  *    `weightDegNonlinear`·‖D²‖², first value 0, last 10% of days
  *    pinned constant — the reference's custom basis), "none", or a
  *    caller-fixed rate (`degRate` %/yr → the reference's cumsum line);
  *  - capacity change: nonpositive piecewise-constant on the
  *    pipeline's capacity-change labels (absent labels → zeros).
  *
  * Solved house-style (no cvxpy/OSQP): outer pinball-IRLS reweighting
  * (the q72/q76 idiom) around exact block solves — ridged WLS for the
  * Fourier block, closed-form weighted slope / weighted-PAVA /
  * pentadiagonal banded for the degradation models, per-label weighted
  * means for capacity change, and an IRLS-L1 normal-equation solve
  * over the sawtooth dictionary (active-column assembly: each row
  * touches one segment per (k, phase) plus the constant, so the
  * C×C system builds in O(T·61²)) with the ≤ 0 value constraints
  * enforced by an asymmetric quadratic penalty plus a final exact
  * clamp. Level degeneracies (the dictionary's constant column, the
  * degradation origin, the capacity-change offset) are resolved the
  * way the reference's constraints pin them: deg(0) = 0 and
  * max(capacity) = 0, with the shifts folded into the seasonal level.
  */
object LossFactor {

  /** One dictionary column: values over `[start, start+values.length)`,
    * zero elsewhere.
    */
  final case class DictCol(start: Int, values: Array[Double])

  /** The reference's `make_sawtooth_dictionary(T)` exactly: column 0 is
    * constant −1; then for k = 2..31 and phase ∈ {0, π}, the falling
    * sawtooth `sawtooth(linspace(−phase, k·2π−phase, T), width=0)/2 −
    * 0.5` (= −((x mod 2π)/2π), values in (−1, 0]) split at its
    * `find_peaks` restart indices into per-segment columns.
    */
  def sawtoothDictionary(T: Int): Array[DictCol] = {
    val cols = scala.collection.mutable.ArrayBuffer.empty[DictCol]
    cols += DictCol(0, Array.fill(T)(-1.0))
    val twoPi = 2.0 * math.Pi
    var k = 2
    while (k <= 31) {
      for (phase <- Seq(0.0, math.Pi)) {
        val start = -phase
        val end = k * twoPi - phase
        val wf = Array.tabulate(T) { i =>
          val x = if (T == 1) start else start + (end - start) * i / (T - 1.0)
          // Python-style mod: result in [0, 2π) for any sign of x
          val m = x - twoPi * math.floor(x / twoPi)
          -m / twoPi
        }
        // scipy find_peaks default: strict local maxima, endpoints
        // excluded
        val peaks = (1 until T - 1).filter(i => wf(i - 1) < wf(i) && wf(i) > wf(i + 1))
        val bounds = (0 +: peaks) :+ T
        var s = 0
        while (s < bounds.length - 1) {
          val lo = bounds(s); val hi = bounds(s + 1)
          if (hi > lo) cols += DictCol(lo, java.util.Arrays.copyOfRange(wf, lo, hi))
          s += 1
        }
      }
      k += 1
    }
    cols.toArray
  }

  final case class Decomposition(
      seasonal: Array[Double],
      capacityChange: Array[Double],
      soiling: Array[Double],
      degradation: Array[Double],
      residual: Array[Double]
  )

  // asymmetric penalty strength for the ≤ 0 / monotone constraints
  private val Kappa = 1e6

  def decompose(
      logEnergy: Array[Double],
      useIx0: Array[Boolean] = null,
      capacityLabels: Array[Int] = null,
      tau: Double = 0.9,
      harmonics: Int = 4,
      weightSeasonal: Double = 0.1,
      weightSoilStiffness: Double = 0.5,
      weightSoilSparsity: Double = 0.01,
      weightDegNonlinear: Double = 1e5,
      degType: String = "linear",
      degRate: Option[Double] = None,
      includeSoiling: Boolean = true,
      rounds: Int = 30
  ): Decomposition = {
    val T = logEnergy.length
    require(Set("linear", "nonlinear", "none")(degType), s"unknown degType '$degType'")
    val known = Array.tabulate(T)(i =>
      (useIx0 == null || useIx0(i)) && !logEnergy(i).isNaN && !logEnergy(i).isInfinite)
    val y = logEnergy
    val period = 365.2425
    val pSeas = 1 + 2 * harmonics
    val fRows = Array.tabulate(T)(i => Linalg.fourierRow(i.toDouble, period, harmonics))

    val dict: Array[DictCol] = if (includeSoiling) sawtoothDictionary(T) else Array.empty
    val nC = dict.length
    // per-row active columns (colIdx, value): one per (k, phase)
    // segment covering the row, plus the constant column
    val active: Array[Array[(Int, Double)]] = {
      val b = Array.fill(T)(scala.collection.mutable.ArrayBuffer.empty[(Int, Double)])
      var c = 0
      while (c < nC) {
        val col = dict(c)
        var i = 0
        while (i < col.values.length) {
          b(col.start + i) += ((c, col.values(i)))
          i += 1
        }
        c += 1
      }
      b.map(_.toArray)
    }
    var gamma = new Array[Double](nC)
    // unclamped dictionary values — the ≤ 0 penalty and the value-L1
    // reweight must see the raw fit, not the clamped output
    var soilRaw = new Array[Double](T)
    // annealed IRLS-L1 floor: a hard 1e-6 floor from a zero init makes
    // γ = 0 a fixed point (the reweight is then a ~1e6 ridge); start
    // soft and tighten each round
    var l1Eps = 1.0

    val labels: Array[Int] = capacityLabels
    val labelSet: Array[Int] = if (labels == null) Array.empty else labels.distinct.sorted

    var seasonalBeta = new Array[Double](pSeas)
    var lev = 0.0 // constraint-normalization shifts, folded into seasonal
    var deg = new Array[Double](T)
    var soil = new Array[Double](T)
    var cap = new Array[Double](T)
    val w = Array.fill(T)(1.0)

    def seasonalAt(i: Int): Double = {
      val row = fRows(i)
      var s = lev
      var j = 0
      while (j < pSeas) { s += seasonalBeta(j) * row(j); j += 1 }
      s
    }

    def fitSeasonal(): Unit = {
      val ata = new Array[Double](pSeas * pSeas)
      val atb = new Array[Double](pSeas)
      var i = 0
      while (i < T) {
        if (known(i)) {
          val r = fRows(i)
          val target = y(i) - lev - deg(i) - soil(i) - cap(i)
          var a = 0
          while (a < pSeas) {
            val wra = w(i) * r(a)
            atb(a) += wra * target
            var bb = 0
            while (bb <= a) { ata(a * pSeas + bb) += wra * r(bb); bb += 1 }
            a += 1
          }
        }
        i += 1
      }
      var d = 0
      while (d < pSeas) {
        // gfosd Fourier weight: ridge on the HARMONIC coefficients
        ata(d * pSeas + d) += (if (d == 0) 1e-9 else weightSeasonal)
        d += 1
      }
      seasonalBeta = Linalg.solveSpd(ata, atb, pSeas)
    }

    def fitDeg(): Unit = degType match {
      case "none" => deg = new Array[Double](T)
      case _ if degRate.isDefined =>
        val slope = degRate.get / 100.0 / 365.0
        deg = Array.tabulate(T)(i => slope * i)
      case "linear" =>
        var num = 0.0; var den = 0.0
        var i = 0
        while (i < T) {
          if (known(i)) {
            val r = y(i) - seasonalAt(i) - soil(i) - cap(i)
            num += w(i) * r * i
            den += w(i) * i.toDouble * i
          }
          i += 1
        }
        val m = if (den > 0) num / den else 0.0
        deg = Array.tabulate(T)(i => m * i)
      case "nonlinear" =>
        // monotone nonincreasing + smooth D² + tail (last 10%) pinned
        // constant: pentadiagonal banded with a huge tie penalty on the
        // tail's first differences, asymmetric penalty on rising
        // differences, then exact PAVA projection + tail overwrite
        val nReduce = math.max(1, (0.9 * T).toInt)
        val resid = Array.tabulate(T)(i => y(i) - seasonalAt(i) - soil(i) - cap(i))
        var x = deg.clone()
        var it = 0
        var kap = Kappa
        while (it < 10) {
          val diag = new Array[Double](T)
          val sub1 = new Array[Double](T)
          val sub2 = new Array[Double](T)
          val rhs = new Array[Double](T)
          var i2 = 0
          while (i2 < T) {
            if (known(i2)) { diag(i2) += w(i2); rhs(i2) += w(i2) * resid(i2) }
            i2 += 1
          }
          var j = 0
          while (j <= T - 3) {
            val wj = weightDegNonlinear
            // solveBandedSpd stores band(r)(i) = A(i, i+r): the
            // off-diagonal entry for rows (i, i+r) lives at the
            // SMALLER index
            diag(j) += wj; diag(j + 1) += 4.0 * wj; diag(j + 2) += wj
            sub1(j) += -2.0 * wj; sub1(j + 1) += -2.0 * wj
            sub2(j) += wj
            j += 1
          }
          j = 0
          while (j <= T - 2) {
            val d = x(j + 1) - x(j)
            val tie = j >= nReduce - 1
            val pen = if (tie) Kappa * 1e3 else if (d > 1e-12) kap else 0.0
            if (pen > 0) {
              diag(j) += pen; diag(j + 1) += pen; sub1(j) += -pen
            }
            j += 1
          }
          var d0 = 0
          while (d0 < T) { diag(d0) += 1e-12; d0 += 1 }
          x = Linalg.solveBandedSpd(Array(diag, sub1, sub2), rhs)
          var worst = 0.0
          j = 0
          while (j <= T - 2) { val d = x(j + 1) - x(j); if (d > worst) worst = d; j += 1 }
          if (worst < 1e-7) it = 10 else { kap *= 8.0; it += 1 }
        }
        val wts = Array.tabulate(T)(i => if (known(i)) math.max(w(i), 1e-12) else 1e-12)
        val mono = Kernels.isotonicDecreasing(x, wts)
        var j = nReduce
        while (j < T) { mono(j) = mono(nReduce - 1); j += 1 }
        deg = mono
      case _ => ()
    }

    def fitSoil(): Unit = if (includeSoiling && nC > 0) {
      // Per-row quadratic weights W̃ and the linear term b. Data weight
      // only on known rows; the value-sparsity and ≤ 0 penalties apply
      // to every day (the component exists on the full axis, as in the
      // reference).
      val rowW = new Array[Double](T)
      val bVec = new Array[Double](T)
      var i = 0
      while (i < T) {
        val dataW = if (known(i)) w(i) else 0.0
        val sparseW = weightSoilSparsity / math.max(math.abs(soilRaw(i)), l1Eps)
        val violW = if (soilRaw(i) > 1e-12) Kappa else 0.0
        rowW(i) = dataW + sparseW + violW
        bVec(i) = if (known(i)) dataW * (y(i) - seasonalAt(i) - deg(i) - cap(i)) else 0.0
        i += 1
      }
      // IRLS-L1 coefficient ridge D
      val dDiag = Array.tabulate(nC)(c =>
        weightSoilStiffness / math.max(math.abs(gamma(c)), l1Eps) + 1e-9)
      // The dictionary is OVERCOMPLETE (C ≈ 2·Σk segments ≫ T for any
      // realistic span — 466 columns at T = 30, 1021 at a year), so the
      // primal C×C normal equations are the wrong shape: solve in the
      // T-dimensional DUAL via the matrix-inversion lemma instead.
      //   (SᵀW̃S + D)γ = Sᵀb
      //   γ = D⁻¹Sᵀ(b − h),  (W̃⁻¹ + SD⁻¹Sᵀ)h = (SD⁻¹Sᵀ)b
      // M = SD⁻¹Sᵀ assembles in O(Σ segment²) ≈ 8T²·ln k — each
      // column touches only its own segment — and the solve is T×T.
      // Measured: the primal form made the fleet-wide q86 gate cost
      // 170 s at sf0.1 (1500 × 466³/6 Cholesky flops); the dual is
      // ~100× cheaper and exactly the same minimizer.
      val gNew = {
        val m = new Array[Double](T * T)
        val mb = new Array[Double](T)
        var c = 0
        while (c < nC) {
          val col = dict(c)
          val inv = 1.0 / dDiag(c)
          val len = col.values.length
          // t = (Σ v_z b_z)/D_c for the Mb accumulation
          var t = 0.0
          var a = 0
          while (a < len) { t += col.values(a) * bVec(col.start + a); a += 1 }
          t *= inv
          a = 0
          while (a < len) {
            val ia = col.start + a
            val va = col.values(a) * inv
            mb(ia) += col.values(a) * t
            var b2 = 0
            while (b2 <= a) {
              val ib = col.start + b2
              m(ia * T + ib) += va * col.values(b2)
              b2 += 1
            }
            a += 1
          }
          c += 1
        }
        var d0 = 0
        while (d0 < T) { m(d0 * T + d0) += 1.0 / rowW(d0); d0 += 1 }
        val h = Linalg.solveSpd(m, mb, T)
        Array.tabulate(nC) { cc =>
          val col = dict(cc)
          var s = 0.0
          var a = 0
          while (a < col.values.length) {
            val ia = col.start + a
            s += col.values(a) * (bVec(ia) - h(ia))
            a += 1
          }
          s / dDiag(cc)
        }
      }
      // damped update: undamped IRLS-L1 over an overcomplete dictionary
      // CYCLES between sparse supports (measured: soil depth oscillated
      // −0.10 / −0.04 between adjacent rounds); halving the step makes
      // the fixed point attracting without changing it
      var gi = 0
      while (gi < nC) { gamma(gi) = 0.5 * gamma(gi) + 0.5 * gNew(gi); gi += 1 }
      val s = new Array[Double](T)
      var c = 0
      while (c < nC) {
        val col = dict(c)
        val g = gamma(c)
        var j = 0
        while (j < col.values.length) { s(col.start + j) += g * col.values(j); j += 1 }
        c += 1
      }
      soilRaw = s
      // exact feasibility (the asymmetric penalty drives violations to
      // ~0; the clamp removes the last epsilon)
      var j = 0
      while (j < T) { soil(j) = math.min(s(j), 0.0); j += 1 }
      l1Eps = math.max(l1Eps * 0.5, 1e-6)
    }

    def fitCap(): Unit = if (labelSet.nonEmpty) {
      val sums = new Array[Double](labelSet.length)
      val wsum = new Array[Double](labelSet.length)
      val idxOf = labelSet.zipWithIndex.toMap
      var i = 0
      while (i < T) {
        if (known(i)) {
          val l = idxOf(labels(i))
          sums(l) += w(i) * (y(i) - seasonalAt(i) - deg(i) - soil(i))
          wsum(l) += w(i)
        }
        i += 1
      }
      val means = Array.tabulate(labelSet.length)(l =>
        if (wsum(l) > 0) sums(l) / wsum(l) else 0.0)
      // ≤ 0 with the tiny L1 pinning the largest label to zero: shift
      // the max into the seasonal level
      val mx = means.max
      lev += mx
      i = 0
      while (i < T) { cap(i) = means(idxOf(labels(i))) - mx; i += 1 }
    }

    var r = 0
    while (r < rounds) {
      fitSeasonal()
      fitDeg()
      // deg(0) = 0: fold the offset into the level (linear/fixed forms
      // are already exact; nonlinear needs the shift)
      if (T > 0 && deg(0) != 0.0) {
        val sh = deg(0)
        lev += sh
        var i = 0
        while (i < T) { deg(i) -= sh; i += 1 }
      }
      // capacity before soiling: both can express a level drop, but
      // the label basis is the cheaper (penalty-free) explanation — the
      // reference's joint solve resolves this degeneracy the same way,
      // since the soiling term pays L1 for what the labels give freely
      fitCap()
      fitSoil()
      // pinball IRLS reweight (the q72 idiom)
      var i = 0
      while (i < T) {
        if (known(i)) {
          val resid = y(i) - seasonalAt(i) - deg(i) - soil(i) - cap(i)
          val g = if (resid > 0) tau else 1.0 - tau
          w(i) = g / math.max(math.abs(resid), 1e-6)
        }
        i += 1
      }
      r += 1
    }

    val seasonal = Array.tabulate(T)(seasonalAt)
    val residual = Array.tabulate(T)(i =>
      if (known(i)) y(i) - seasonal(i) - deg(i) - soil(i) - cap(i) else 0.0)
    Decomposition(seasonal, cap, soil, deg, residual)
  }

  final case class LossReport(
      totalEnergyLoss: Double,
      degradationLoss: Double,
      soilingLoss: Double,
      capacityChangeLoss: Double,
      weatherLoss: Double,
      outageLoss: Double,
      degradationRatePctYr: Double
  )

  /** `estimate_losses` + `attribute_losses`
    * (`loss_factor_analysis.py:200-232, 620-656`): exponentiate the
    * decomposition into the multiplicative energy model
    * (baseline = exp(seasonal); degradation / soiling / capacity /
    * weather factors; outage as the use-mask player) and attribute
    * total − baseline EXACTLY over the 2⁵ hypercube with the existing
    * Shapley kernel (Σ attributions ≡ total − baseline, the
    * reference's own assert). Degradation rate is the reference's
    * year-over-year median of the exp'd trend (NaN below 366 days).
    */
  def estimateLosses(
      energy: Array[Double],
      useIx: Array[Boolean],
      d: Decomposition
  ): LossReport = {
    val T = energy.length
    val baseline = d.seasonal.map(math.exp)
    val degF = d.degradation.map(math.exp)
    val soilF = d.soiling.map(math.exp)
    val capF = d.capacityChange.map(math.exp)
    val weatherF = d.residual.map(math.exp)
    val outage = Array.tabulate(T)(i => if (useIx(i)) 1.0 else 0.0)
    val attr = Kernels.shapleyAttribution(
      baseline, Array(degF, soilF, capF, weatherF, outage))
    var total = 0.0
    var i = 0
    while (i < T) { if (useIx(i)) total += energy(i); i += 1 }
    val rate =
      if (T < 366) Double.NaN
      else 100.0 * Kernels.median(Array.tabulate(T - 365)(i =>
        (degF(i + 365) - degF(i)) / degF(i + 365)))
    LossReport(
      totalEnergyLoss = total - baseline.sum,
      degradationLoss = attr(0),
      soilingLoss = attr(1),
      capacityChangeLoss = attr(2),
      weatherLoss = attr(3),
      outageLoss = attr(4),
      degradationRatePctYr = rate
    )
  }
}
