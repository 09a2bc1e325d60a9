package graft

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

import graft.solvers.{Cluster, Kernels}

/** ScalaCheck properties for the solver/relational invariants the
  * reference asserts ad hoc (SURVEY §5: Shapley exactness, roll
  * inverse, median invariance).
  */
class PropertySpec extends AnyFunSuite {

  private def check(p: Prop): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(50), p)
    assert(res.passed, res.status.toString)
  }

  test("shapley attributions always sum exactly to v(all) - v(none)") {
    val genFactors = for {
      n <- Gen.choose(1, 20)
      k <- Gen.choose(1, 4)
      base <- Gen.listOfN(n, Gen.choose(1.0, 100.0))
      fs <- Gen.listOfN(k, Gen.listOfN(n, Gen.choose(0.0, 1.2)))
    } yield (base.toArray, fs.map(_.toArray).toArray)
    check(Prop.forAll(genFactors) { case (base, fs) =>
      val attr = Kernels.shapleyAttribution(base, fs)
      val vAll = base.indices.map(i => base(i) * fs.map(_(i)).product).sum
      val vNone = base.sum
      math.abs(attr.sum - (vAll - vNone)) < 1e-6 * math.max(math.abs(vAll) + math.abs(vNone), 1.0)
    })
  }

  test("roll by s then by -s is the identity on slots") {
    check(Prop.forAll(Gen.choose(1, 200), Gen.choose(-500, 500), Gen.choose(0, 10000)) {
      (spd, shift, slotRaw) =>
        val slot = slotRaw % spd
        val once = math.floorMod(slot + shift, spd)
        math.floorMod(once - shift, spd) == slot
    })
  }

  test("median is order-invariant and within min/max") {
    check(Prop.forAll(Gen.nonEmptyListOf(Gen.choose(-1e6, 1e6))) { xs =>
      val a = xs.toArray
      val m1 = Kernels.median(a)
      val m2 = Kernels.median(new scala.util.Random(0).shuffle(xs).toArray)
      m1 == m2 && m1 >= a.min && m1 <= a.max
    })
  }

  test("huberFit on clean linear data recovers the line for any slope") {
    check(Prop.forAll(Gen.choose(-10.0, 10.0), Gen.choose(-10.0, 10.0)) { (a0, b0) =>
      val x = Array.tabulate(30)(_.toDouble)
      val y = x.map(v => a0 + b0 * v)
      val (a, b) = Cluster.huberFit(x, y)
      math.abs(a - a0) < 1e-6 && math.abs(b - b0) < 1e-7
    })
  }

  test("viterbi2 output length matches input and is stable on constants") {
    check(Prop.forAll(Gen.choose(1, 200), Gen.oneOf(0.2, 1.0)) { (n, r) =>
      val path = Kernels.viterbi2(Array.fill(n)(r))
      path.length == n && path.distinct.length == 1
    })
  }

  test("isotonicDecreasing is a monotone, sum-preserving, idempotent projection") {
    val genY = Gen.nonEmptyListOf(Gen.choose(-100.0, 100.0)).map(_.toArray)
    check(Prop.forAll(genY) { y =>
      val f = Kernels.isotonicDecreasing(y)
      val monotone = f.length < 2 || f.sliding(2).forall(p => p(0) >= p(1) - 1e-9)
      val sumKept = math.abs(f.sum - y.sum) < 1e-6 * math.max(1.0, y.map(math.abs).sum)
      val idempotent = Kernels.isotonicDecreasing(f).zip(f).forall { case (a, b) => math.abs(a - b) < 1e-9 }
      monotone && sumKept && idempotent
    })
  }

  test("topEigen eigenpairs satisfy G v = λ v on random SPD Gram matrices") {
    val genMat = for {
      n <- Gen.choose(2, 8)
      m <- Gen.choose(n, 12)
      vals <- Gen.listOfN(n * m, Gen.choose(-5.0, 5.0))
    } yield {
      val rows = vals.toArray.grouped(n).toArray // m rows of dim n
      Array.tabulate(n, n)((i, j) => rows.map(r => r(i) * r(j)).sum)
    }
    check(Prop.forAll(genMat) { g =>
      val n = g.length
      // extra iterations: random Grams can have a small spectral gap,
      // where power iteration converges slowly (the residual is still
      // bounded by the gap, hence the 1e-3 relative tolerance)
      val eig = Kernels.topEigen(g, 1, iters = 2000)
      val (l, v) = eig(0)
      val gv = Array.tabulate(n)(i => g(i).zip(v).map { case (a, b) => a * b }.sum)
      val scale = math.max(math.abs(l), 1.0)
      l >= -1e-9 && gv.zip(v).forall { case (a, b) => math.abs(a - l * b) < 1e-3 * scale }
    })
  }

  private val genHistogram: Gen[List[(String, Long)]] = for {
    n <- Gen.choose(1, 12)
    words <- Gen.listOfN(n, Gen.nonEmptyListOf(Gen.oneOf('a', 'b', 'c', 'd')).map(_.mkString.take(8)))
    cnts <- Gen.listOfN(n, Gen.choose(1L, 50L))
  } yield words.distinct.zip(cnts)

  test("incremental BPE trainer equals the naive full-recount trainer") {
    import graft.operators.Bpe
    // reference implementation: re-encode every word with the merge
    // prefix list and recount all pairs from scratch each round — the
    // O(merges × histogram) algorithm the incremental pair-index
    // trainer must reproduce exactly, ties included
    def naive(hist: List[(String, Long)], numMerges: Int): Vector[(String, String, Long)] = {
      val out = Vector.newBuilder[(String, String, Long)]
      var merges = Vector.empty[(String, String)]
      var k = 0
      var done = false
      while (k < numMerges && !done) {
        val counts = scala.collection.mutable.Map.empty[(String, String), Long].withDefaultValue(0L)
        for ((w, c) <- hist) {
          val syms = Bpe.encodeWord(w, merges)
          for (i <- 0 until syms.length - 1) counts((syms(i), syms(i + 1))) += c
        }
        if (counts.isEmpty) done = true
        else {
          val ((l, r), c) = counts.minBy { case ((a, b), m) => (-m, a, b) }
          out += ((l, r, c))
          merges = merges :+ ((l, r))
          k += 1
        }
      }
      out.result()
    }
    check(Prop.forAll(genHistogram, Gen.choose(1, 12)) { (hist, m) =>
      hist.isEmpty || Bpe.trainMerges(hist, m) == naive(hist, m)
    })
  }

  test("BPE encoding always reconstructs the word (merges only concatenate)") {
    import graft.operators.Bpe
    check(Prop.forAll(genHistogram, Gen.choose(1, 10)) { (hist, m) =>
      hist.isEmpty || {
        val merges = Bpe.trainMerges(hist, m).map { case (l, r, _) => (l, r) }
        hist.forall { case (w, _) =>
          Bpe.encodeWord(w, merges).mkString == w + Bpe.Eow
        }
      }
    })
  }
}
