package graft

/** Dev probe: fixed-instance pvproDecompose5 intermediates for the
  * q87 oracle authoring. */
object ProbePvpro5 {
  def main(args: Array[String]): Unit = {
    val y = Array(4.50, 4.20, 3.90, 4.10, 4.42, 4.12, 3.80, Double.NaN, 4.30, 4.00, 3.66, 3.86)
    val (x1, x2, x3, x4, x5) = graft.solvers.Kernels.pvproDecompose5(
      y, 4, model = "monotonic", lambda2 = 0.01, lambda4 = 0.05, rounds = 2)
    println("i,x1,x2,x3,x4,x5")
    for (i <- 0 until 12)
      println(f"$i,${x1(i)}%.17g,${x2(i)}%.17g,${x3(i)}%.17g,${x4(i)}%.17g,${x5(i)}%.17g")
    // pen4 for T=12, p=4 (constant): replicate assembly
    val T = 12; val p = 4
    val pen4 = new Array[Double](p * p)
    var i = 0
    while (i <= T - 3) {
      val idx = Array(i % p, (i + 1) % p, (i + 2) % p)
      val cf = Array(1.0, -2.0, 1.0)
      for (a <- 0 until 3; b <- 0 until 3) pen4(idx(a) * p + idx(b)) += cf(a) * cf(b)
      i += 1
    }
    println("pen4 = " + pen4.mkString(","))
  }
}
