package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.analyses.{Profiler, Quantiles}
import graft.operators.DayStats
import graft.solvers.Kernels

/** Focused pins for the round-14 operator-interior rewrites: the
  * DilRow primitive solver lane (Quantiles) and the fused two-pass
  * orientationCells derivation (Profiler). Each asserts the rewritten
  * interior against an INDEPENDENT derivation of the same contract —
  * kernel ground truth for the lane, hand aggregation for the cells —
  * so a drift in the streaming/fusion plumbing fails here, not at the
  * cross-engine gate.
  */
class SolverLaneSpec extends AnyFunSuite {
  lazy val spark: SparkSession = GraftSession.local("4")
  import spark.implicits._

  test("DilRow lane: calendar day offsets across a gap, (day, slot) order, kernel-exact fits") {
    // two sites, shuffled input order, and a 10-day DATA GAP in site 1:
    // the time axis must advance by CALENDAR days (offset 0, 1, 11),
    // not observed-day rank, and rows must solve in (day, slot) order
    // regardless of arrival order
    val nBins = 4
    val days1 = Seq("2024-01-01", "2024-01-02", "2024-01-12")
    val days2 = Seq("2024-06-01", "2024-06-02")
    def rows(site: Long, days: Seq[String]): Seq[(Long, String, Int, Double)] =
      for {
        (d, di) <- days.zipWithIndex
        s <- 0 until nBins
      } yield (site, d, s, 1.0 + 0.5 * math.sin(s + di) + 0.1 * site)
    val all = scala.util.Random.shuffle(rows(1L, days1) ++ rows(2L, days2))
    val dil = all.toDF("site", "day", "dil_slot", "dil_value")
    val out = Quantiles.estimateSingle(spark, dil, nBins = nBins, tau = 0.9)
      .select(col("site"), col("day"), col("dil_slot"), col("q_fit"))
      .as[(Long, String, Int, Double)].collect()
      .groupBy(_._1)

    // independent ground truth: feed the kernel the hand-built
    // (t, y) arrays in (day, slot) order with calendar offsets
    def expected(site: Long, days: Seq[String]): Map[(String, Int), Double] = {
      val ep0 = java.time.LocalDate.parse(days.head).toEpochDay
      val pts = rows(site, days).sortBy(r => (r._2, r._3))
      val t = pts.map(p =>
        (java.time.LocalDate.parse(p._2).toEpochDay - ep0).toDouble * nBins + p._3).toArray
      val y = pts.map(_._4).toArray
      val bases = Seq((nBins.toDouble, 3), (365.2425 * nBins, 2))
      val fit = Kernels.quantileFourierFitMultiTaus(y, t, Seq(0.9), bases).head
      pts.indices.map(i => (pts(i)._2, pts(i)._3) -> fit(i)).toMap
    }
    for ((site, days) <- Seq((1L, days1), (2L, days2))) {
      val exp = expected(site, days)
      val got = out(site)
      assert(got.length == exp.size, s"site $site grain")
      got.foreach { case (_, d, s, f) =>
        // bit-exact: the lane must hand the kernel the identical arrays
        assert(java.lang.Double.compare(f, exp((d, s))) == 0,
          s"site $site day $d slot $s: lane $f vs kernel ${exp((d, s))}")
      }
    }
  }

  test("fused orientationCells: cells = max(v)/p99 and rise/set re-aggregate exactly") {
    // deterministic multi-hslot fixture: 2 sites, 3 days, samples
    // spread over several hours so the (site, day, hslot) partials
    // genuinely re-aggregate (min-of-mins / max-of-maxes over hslots)
    val df = (for {
      site <- Seq(1L, 2L)
      d <- 1 to 3
      hr <- Seq(7, 9, 12, 15, 17)
    } yield (site, java.sql.Timestamp.valueOf(f"2024-03-0$d $hr%02d:30:00"),
      site * 1.0 + d * 0.1 + (5.0 - math.abs(hr - 12)) // peak at noon
    )).toDF("site", "ts", "value")

    val cells = Profiler.orientationCells(spark, df, "site", "ts", "value")
      .select(col("__site"), col("doy"), col("hslot"), col("ct"), col("noon"), col("lat_est"))
      .collect()

    // independent hand derivation of the contract (the round-13 shape)
    val cap = df.groupBy(col("site"))
      .agg(percentile(col("value"), lit(0.99)).as("cap"))
      .as[(Long, Double)].collect().toMap
    val eotH = graft.functions.Solar.equationOfTimeMin(dayofyear(to_date(col("ts")))) / lit(60.0)
    val h = graft.operators.TimeAxis.hourOfDay(col("ts")) + eotH
    val expCells = df
      .select(col("site"), dayofyear(to_date(col("ts"))).as("doy"),
        floor(h).cast("int").as("hslot"), col("value"))
      .as[(Long, Int, Int, Double)].collect()
      .groupBy(t => (t._1, t._2, t._3))
      .map { case (k, vs) => k -> vs.map(_._4).max / cap(k._1) }
    val rs = DayStats.riseSetRough(df, "site", "ts", "value", 0.01)
      .select(col("site"), col("day").cast("string"), col("sunrise_h"), col("sunset_h"))
      .as[(Long, String, Double, Double)].collect()
    assert(rs.nonEmpty && rs.forall(r => r._4 > r._3), "rise/set sanity")

    assert(cells.length == expCells.size, "cell grain")
    cells.foreach { r =>
      val key = (r.getString(0).toLong, r.getInt(1), r.getInt(2))
      assert(java.lang.Double.compare(r.getDouble(3), expCells(key)) == 0,
        s"cell $key: fused ${r.getDouble(3)} vs direct ${expCells(key)}")
    }
    // noon/lat are per-site constants on every cell row
    cells.groupBy(_.getString(0)).foreach { case (_, rows) =>
      assert(rows.map(_.getDouble(4)).distinct.length == 1, "noon constant per site")
      assert(rows.map(_.getDouble(5)).distinct.length == 1, "lat constant per site")
    }
  }
}
