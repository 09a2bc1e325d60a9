package graft

/** Dev probe (temporary): loss-factor recovery vs rounds. */
object ProbeLoss {
  def main(args: Array[String]): Unit = {
    import graft.solvers.LossFactor
    val T = 420
    val rng = new scala.util.Random(19)
    val seas = Array.tabulate(T)(i => 6.5 + 0.15*math.sin(2*math.Pi*i/365.2425) + 0.05*math.cos(4*math.Pi*i/365.2425))
    val slope = -3.0/100.0/365.0
    val deg = Array.tabulate(T)(i => slope*i)
    val soil = Array.tabulate(T)(i => -0.12*((i % 60)/60.0))
    val labels = Array.tabulate(T)(i => if (i < 280) 0 else 1)
    val use = Array.tabulate(T)(i => i % 47 != 3)
    val cap = Array.tabulate(T)(i => if (i < 280) 0.0 else -0.08)
    val logE = Array.tabulate(T) { i =>
      val weather = if (rng.nextDouble() < 0.55) 0.0 else -math.abs(rng.nextGaussian()*0.25)
      seas(i) + deg(i) + soil(i) + cap(i) + weather
    }
    for (r <- Seq(10, 20, 35, 50)) {
      val t0 = System.nanoTime
      val d = LossFactor.decompose(logE, use, labels, rounds = r)
      val sec = (System.nanoTime-t0)/1e9
      println(f"rounds=$r%2d sec=$sec%.1f depth=${d.soiling.min}%.4f gap=${d.capacityChange(300)-d.capacityChange(100)}%.4f slope=${d.degradation(T-1)/(T-1.0)}%.2e (true -8.2e-5)")
    }
  }
}
