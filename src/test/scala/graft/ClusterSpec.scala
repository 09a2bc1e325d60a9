package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.solvers.Cluster

class ClusterSpec extends AnyFunSuite {

  test("dbscan2d separates two blobs and flags far noise") {
    val blob1 = Array.tabulate(10)(i => (0.1 + i * 0.001, 0.1 + i * 0.001))
    val blob2 = Array.tabulate(10)(i => (0.9 + i * 0.001, 0.9 - i * 0.001))
    val noise = Array((0.5, 0.99))
    val pts = blob1 ++ blob2 ++ noise
    val labels = Cluster.dbscan2d(pts.map(_._1), pts.map(_._2), eps = 0.05, minPts = 3)
    assert(labels.take(10).distinct.length == 1 && labels.take(10).head >= 0)
    assert(labels.slice(10, 20).distinct.length == 1 && labels(10) != labels(0))
    assert(labels.last == -1)
  }

  test("huberFit ignores a gross outlier that wrecks OLS") {
    val x = Array.tabulate(50)(_.toDouble)
    val y = x.map(v => 2.0 + 3.0 * v)
    y(25) = 1e4 // gross outlier
    val (a, b) = Cluster.huberFit(x, y)
    assert(math.abs(b - 3.0) < 0.05, s"slope $b")
    assert(math.abs(a - 2.0) < 1.5, s"intercept $a")
  }

  test("cosineFit recovers amplitude, phase, offset") {
    val x = Array.tabulate(100)(i => i * 2 * math.Pi / 100)
    val y = x.map(v => 5.0 * math.cos(v - 0.7) + 2.0)
    val (c, phase, off) = Cluster.cosineFit(x, y)
    assert(math.abs(c - 5.0) < 1e-6, s"c $c")
    assert(math.abs(phase - 0.7) < 1e-6, s"phase $phase")
    assert(math.abs(off - 2.0) < 1e-6, s"off $off")
  }
}
