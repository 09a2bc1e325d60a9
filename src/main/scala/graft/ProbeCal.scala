package graft

/** Dev probe: measures the Bench host-health calibration kernel
  * (median-of-3 parallel passes) N times and prints each reading —
  * the committed CalibrationPinnedSec value was pinned from this
  * probe's output on the close host (round 12: 8 readings in
  * 0.464–0.510 s, median 0.484).
  */
object ProbeCal {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(5)
    val rs = (1 to n).map { i =>
      val r = Bench.calibrate()
      println(f"[cal] reading $i: $r%.4f s")
      r
    }
    println(f"[cal] median: ${rs.sorted.apply(rs.length / 2)}%.4f (pinned ${Bench.CalibrationPinnedSec})")
    val bs = (1 to n).map { i =>
      val r = Bench.calibrateBandwidth()
      println(f"[bw]  reading $i: $r%.4f s")
      r
    }
    println(f"[bw]  median: ${bs.sorted.apply(bs.length / 2)}%.4f (pinned ${Bench.BwPinnedSec})")
    // splice check: lane JSON gains a calibration object
    println("[cal] splice: " + Bench.calibrated("probe", maxAttempts = 1)("""{"a":1}"""))
  }
}
