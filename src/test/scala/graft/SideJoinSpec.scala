package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{DayStats, SideJoin}
import graft.sources.Tables

/** The broadcast-envelope escape hatch (DESIGN round-3 scale audit):
  * every join-back of a scan-DERIVED side table routes through
  * [[SideJoin.back]]. Default = forced broadcast (side grows with
  * site-days, ~10⁵× smaller than the scan). `spark.graft.sideJoin=
  * shuffle` flips ALL of them to sort-merge in one place — the plan a
  * deployment past ~10⁸ site-days combines with `site`-bucketed input
  * (BucketingSpec) to keep the join co-partitioned.
  */
class SideJoinSpec extends AnyFunSuite {
  lazy val spark: SparkSession = GraftSession.local("4")

  private def withStrategy[A](mode: String)(f: => A): A = {
    spark.conf.set(SideJoin.ConfKey, mode)
    try f
    finally spark.conf.unset(SideJoin.ConfKey)
  }

  test("default strategy forces a broadcast join-back") {
    val ev = Tables.events(spark, "/root/testdata/sf0.001")
    val out = DayStats.clipStats(ev, "user_id", "ts", "value")
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"expected broadcast join-back:\n$plan")
  }

  test("shuffle strategy removes every broadcast and matches the broadcast results") {
    val ev = Tables.events(spark, "/root/testdata/sf0.001")

    def rows(df: org.apache.spark.sql.DataFrame): Map[(Long, String), (Double, Double)] =
      df.collect().map { r =>
        (r.getLong(0), r.getDate(1).toString) -> (r.getDouble(2), r.getDouble(3))
      }.toMap

    val base = rows(DayStats.clipStats(ev, "user_id", "ts", "value"))

    withStrategy(SideJoin.Shuffle) {
      val out = DayStats.clipStats(ev, "user_id", "ts", "value")
      val plan = out.queryExecution.executedPlan.toString
      assert(!plan.contains("BroadcastHashJoin"), s"broadcast survived the shuffle strategy:\n$plan")
      assert(plan.contains("SortMergeJoin"), s"expected sort-merge join-back:\n$plan")
      val got = rows(out)
      assert(got.keySet == base.keySet, "shuffle strategy changed the key set")
      // only the join implementation differs; aggregation input order
      // may not, so allow last-ulp float drift on the sums
      base.foreach { case (k, (c1, c2)) =>
        val (g1, g2) = got(k)
        assert(math.abs(g1 - c1) <= 1e-12 && math.abs(g2 - c2) <= 1e-12,
          s"value drift at $k: ($c1,$c2) vs ($g1,$g2)")
      }
    }
  }

  test("unknown strategy fails fast") {
    val ev = Tables.events(spark, "/root/testdata/sf0.001")
    withStrategy("nested-loop") {
      val err = intercept[IllegalArgumentException] {
        DayStats.dailyDensity(ev, "user_id", "ts", "value")
      }
      assert(err.getMessage.contains(SideJoin.ConfKey))
    }
  }
}
