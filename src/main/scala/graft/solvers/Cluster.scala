package graft.solvers

/** Small per-site model-selection kernels (SURVEY §2.9): DBSCAN on
  * day-score pairs, Huber IRLS regression, Gauss–Newton curve fit.
  * All O(num_days²) or better on bounded per-site state inside
  * `mapGroups` — never on the raw grain.
  */
object Cluster {

  /** Classic DBSCAN on 2-D points (reference quality clustering,
    * `data_handler.py:1172-1199`: eps=0.03 on (density, linearity)).
    * Returns cluster labels (−1 = noise), deterministic in input
    * order. O(n²) — n = num_days.
    */
  def dbscan2d(xs: Array[Double], ys: Array[Double], eps: Double, minPts: Int): Array[Int] = {
    val n = xs.length
    val labels = Array.fill(n)(-2) // -2 unvisited, -1 noise
    val eps2 = eps * eps
    def neighbors(i: Int): Array[Int] =
      (0 until n).filter { j =>
        val dx = xs(i) - xs(j)
        val dy = ys(i) - ys(j)
        dx * dx + dy * dy <= eps2
      }.toArray
    var cluster = -1
    var i = 0
    while (i < n) {
      if (labels(i) == -2) {
        val nb = neighbors(i)
        if (nb.length < minPts) labels(i) = -1
        else {
          cluster += 1
          labels(i) = cluster
          var queue = scala.collection.mutable.Queue(nb.toIndexedSeq: _*)
          while (queue.nonEmpty) {
            val j = queue.dequeue()
            if (labels(j) == -1) labels(j) = cluster
            if (labels(j) == -2) {
              labels(j) = cluster
              val nb2 = neighbors(j)
              if (nb2.length >= minPts) queue ++= nb2
            }
          }
        }
      }
      i += 1
    }
    labels
  }

  /** Huber IRLS for single-feature linear regression y ≈ a + b·x
    * (reference sensor-ID fits, `sensor_identification.py:49-124`).
    * @return (intercept, slope)
    */
  def huberFit(x: Array[Double], y: Array[Double], delta: Double = 1.345, iters: Int = 20): (Double, Double) = {
    val n = x.length
    var a = 0.0
    var b = 0.0
    var w = Array.fill(n)(1.0)
    var it = 0
    while (it < iters) {
      var sw = 0.0; var swx = 0.0; var swy = 0.0; var swxx = 0.0; var swxy = 0.0
      var i = 0
      while (i < n) {
        sw += w(i); swx += w(i) * x(i); swy += w(i) * y(i)
        swxx += w(i) * x(i) * x(i); swxy += w(i) * x(i) * y(i)
        i += 1
      }
      val det = sw * swxx - swx * swx
      if (math.abs(det) < 1e-12) return (a, b)
      a = (swxx * swy - swx * swxy) / det
      b = (sw * swxy - swx * swy) / det
      // robust scale from MAD of residuals
      val r = Array.tabulate(n)(i => y(i) - a - b * x(i))
      val s = math.max(Kernels.median(r.map(math.abs)) / 0.6745, 1e-9)
      i = 0
      while (i < n) {
        val u = math.abs(r(i)) / (delta * s)
        w(i) = if (u <= 1.0) 1.0 else 1.0 / u
        i += 1
      }
      it += 1
    }
    (a, b)
  }

  /** Gauss–Newton fit of a cosine-of-incidence-style model
    * y ≈ c·cos(x − phase) + offset (the shape behind the reference's
    * tilt/azimuth estimation, `angle_of_incidence/curve_fitting.py`).
    * @return (c, phase, offset)
    */
  def cosineFit(x: Array[Double], y: Array[Double], iters: Int = 50): (Double, Double, Double) = {
    val n = x.length
    var c = (y.max - y.min) / 2.0
    var phase = 0.0
    var off = y.sum / n
    var it = 0
    while (it < iters) {
      // residuals and Jacobian (3 params)
      val jtj = new Array[Double](9)
      val jtr = new Array[Double](3)
      var i = 0
      while (i < n) {
        val cs = math.cos(x(i) - phase)
        val sn = math.sin(x(i) - phase)
        val r = y(i) - (c * cs + off)
        val j0 = cs // d/dc
        val j1 = c * sn // d/dphase
        val j2 = 1.0 // d/doff
        jtj(0) += j0 * j0; jtj(1) += j0 * j1; jtj(2) += j0 * j2
        jtj(4) += j1 * j1; jtj(5) += j1 * j2; jtj(8) += j2 * j2
        jtr(0) += j0 * r; jtr(1) += j1 * r; jtr(2) += j2 * r
        i += 1
      }
      jtj(3) = jtj(1); jtj(6) = jtj(2); jtj(7) = jtj(5)
      var d = 0
      while (d < 3) { jtj(d * 3 + d) += 1e-9; d += 1 }
      val step = Linalg.solveSpd(jtj, jtr, 3)
      c += step(0); phase += step(1); off += step(2)
      it += 1
    }
    (c, phase, off)
  }
}
