package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.solvers.Cluster

/** Tilt/azimuth estimation (reference `tilt_azimuth_study.py` /
  * `angle_of_incidence/curve_fitting.py`): the Gauss–Newton fit of
  * the Duffie 1.6.2 model on the reference's OWN (δ, ω) fixture
  * arrays, and the fleet operator end to end on model-generated
  * power.
  */
class TiltAzimuthSpec extends AnyFunSuite {
  lazy val spark: SparkSession = GraftSession.local("4")

  private def loadVec(path: String): Array[Double] = {
    val src = scala.io.Source.fromFile(path)
    try src.getLines().map(_.trim.toDouble).toArray finally src.close()
  }

  test("kernel recovers (tilt, azimuth) on the reference's delta/omega fixtures") {
    // the reference test's inputs (tests/fixtures/tilt_azimuth/
    // {delta_f,omega_f}.csv, degrees) at its latitude 39.4856; its
    // costheta fixture is absent from the repo, so the dependent data
    // is synthesized from the same Duffie model at a known
    // (tilt 32°, azimuth −10°) and the fit must invert it exactly
    val deltaDeg = loadVec("/root/reference/tests/fixtures/tilt_azimuth/delta_f.csv")
    val omegaDeg = loadVec("/root/reference/tests/fixtures/tilt_azimuth/omega_f.csv")
    assert(deltaDeg.length == omegaDeg.length && deltaDeg.length > 9000)
    val phi = math.toRadians(39.4856)
    val betaTrue = math.toRadians(32.0)
    val gammaTrue = math.toRadians(-10.0)
    val delta = deltaDeg.map(math.toRadians)
    val omega = omegaDeg.map(math.toRadians)
    val ct = delta.indices.map(i =>
      Cluster.costhetaDuffie(delta(i), omega(i), phi, betaTrue, gammaTrue)).toArray
    // the reference's init_values = [30, 30] degrees
    val (b, g) = Cluster.tiltAzimuthFit(delta, omega, ct, phi)
    assert(math.abs(math.toDegrees(b) - 32.0) < 1e-3, f"tilt ${math.toDegrees(b)}%.4f")
    assert(math.abs(math.toDegrees(g) - (-10.0)) < 1e-3, f"az ${math.toDegrees(g)}%.4f")
  }

  test("fit survives noise and a clipped (cosθ ≥ 0 only) sample set") {
    val n = 4000
    val rng = new scala.util.Random(11)
    val phi = math.toRadians(37.0)
    val betaTrue = math.toRadians(20.0)
    val gammaTrue = math.toRadians(12.0)
    val delta = Array.fill(n)(math.toRadians(-23.45 + 46.9 * rng.nextDouble()))
    val omega = Array.fill(n)(math.toRadians(-75.0 + 150.0 * rng.nextDouble()))
    val pts = delta.indices.flatMap { i =>
      val v = Cluster.costhetaDuffie(delta(i), omega(i), phi, betaTrue, gammaTrue)
      if (v > 0.1) Some((delta(i), omega(i), v + 0.01 * (rng.nextDouble() - 0.5)))
      else None // a real signal only samples sun-on-panel cells
    }
    val (b, g) = Cluster.tiltAzimuthFit(
      pts.map(_._1).toArray, pts.map(_._2).toArray, pts.map(_._3).toArray, phi)
    assert(math.abs(math.toDegrees(b) - 20.0) < 0.5, f"tilt ${math.toDegrees(b)}%.3f")
    assert(math.abs(math.toDegrees(g) - 12.0) < 0.5, f"az ${math.toDegrees(g)}%.3f")
  }

  test("degenerate fits report NaN, never the init values") {
    // too few samples (reference fills np.nan on curve_fit failure) —
    // a sub-8-point input cannot identify two angles and must not
    // hand back the (30°, 30°) init as if it were an estimate.
    // (Richer degeneracies — e.g. a single-declination season — are
    // non-UNIQUE rather than un-fittable: many (β, γ) reproduce the
    // curve exactly, so the fit legitimately returns one of them.)
    val (b1, g1) = Cluster.tiltAzimuthFit(
      Array(0.1, 0.2), Array(0.0, 0.1), Array(0.9, 0.8), math.toRadians(37))
    assert(b1.isNaN && g1.isNaN)
  }

  test("fleet operator recovers orientation from model-generated power") {
    import spark.implicits._
    val phiDeg = 37.5
    val betaTrue = math.toRadians(25.0)
    val gammaTrue = math.toRadians(-8.0)
    val slots = 288
    val rows = for {
      d <- 0 until 365
      s <- 0 until slots
    } yield {
      val doy = d + 1
      val deltaR = math.toRadians(23.45 * math.sin(2 * math.Pi * (doy + 284.0) / 365.0))
      val h = s * 24.0 / slots
      // CLOCK-time samples: solar hour = clock + EoT (Spencer, the
      // operator's own correction must undo this)
      val b = 2.0 * math.Pi * (doy - 1) / 365.0
      val eotH = 229.18 * (0.000075 + 0.001868 * math.cos(b) - 0.032077 * math.sin(b) -
        0.014615 * math.cos(2 * b) - 0.04089 * math.sin(2 * b)) / 60.0
      val omegaR = math.toRadians(15.0 * (h + eotH - 12.0))
      val phiR = math.toRadians(phiDeg)
      val ct = Cluster.costhetaDuffie(deltaR, omegaR, phiR, betaTrue, gammaTrue)
      // beam + 10% diffuse: diffuse light reaches the panel whenever
      // the sun is above the HORIZON, which is what pins the
      // operator's rise/set-midpoint noon to true solar noon even for
      // an off-south panel (a beam-only model has no azimuth-free
      // dawn, and no real site is beam-only)
      val sinElev = math.sin(phiR) * math.sin(deltaR) +
        math.cos(phiR) * math.cos(deltaR) * math.cos(omegaR)
      val beam = if (sinElev > 0) math.max(ct, 0.0) else 0.0
      val diffuse = math.max(sinElev, 0.0)
      val ts = java.sql.Timestamp.valueOf(
        java.time.LocalDate.of(2023, 1, 1).plusDays(d).atTime(0, 0).plusMinutes(s * 5L))
      (0L, ts, 10.0 * (0.9 * beam + 0.1 * diffuse))
    }
    val df = rows.toDF("site", "ts", "power")
    val latTable = Seq((0L, phiDeg)).toDF("site", "lat_est")
    val out = graft.analyses.Profiler
      .estimateOrientation(spark, df, "site", "ts", "power", latOverride = Some(latTable))
      .collect()
    assert(out.length == 1)
    val tilt = out(0).getAs[Double]("tilt_deg")
    val az = out(0).getAs[Double]("azimuth_duffie_deg")
    assert(math.abs(tilt - 25.0) < 4.0, f"tilt $tilt%.2f vs 25")
    assert(math.abs(az - (-8.0)) < 5.0, f"azimuth $az%.2f vs -8")
  }
}
