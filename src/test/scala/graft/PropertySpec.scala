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
}
