package graft

import java.sql.Timestamp

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.analyses.QualityClusters

/** Canonicalization contract of the day-quality DBSCAN face: core
  * flags, min-day cluster names, the stated min-rule for a border
  * point adjacent to TWO clusters (the tie classic DBSCAN leaves
  * unspecified — q67's oracle replays this same rule, so the spec is
  * the place that checks the rule against hand geometry).
  */
class QualityClustersSpec extends AnyFunSuite {
  lazy val spark: SparkSession = GraftSession.local("4")

  test("two clusters, a two-sided border day, and noise get canonical labels") {
    import spark.implicits._
    // engineered day features on one site: density = k/200 (k slots at
    // value 10, rest 0), daily_max = 10 every day so the normalized y
    // is constant and distances live on the density axis alone.
    // eps = 0.06, minPts = 4 (self included):
    //   A: .200 .215 .230 .245  (pairwise ≤ .045 → all core)
    //   B: .355 .370 .385 .400  (all core)
    //   P: .300 — within .055 of A4 and B1, itself only 3 neighbors
    //      incl self → border adjacent to BOTH clusters
    //   N: .600 — no neighbors → noise
    val ks = Seq(
      "2024-01-01" -> 40, "2024-01-02" -> 43, "2024-01-03" -> 46,
      "2024-01-04" -> 49, "2024-01-05" -> 60 /* P */,
      "2024-01-06" -> 71, "2024-01-07" -> 74, "2024-01-08" -> 77,
      "2024-01-09" -> 80, "2024-01-10" -> 120 /* N */)
    val rows = for {
      (day, k) <- ks
      slot <- 0 until 200
    } yield (1L, Timestamp.valueOf(s"$day 00:00:00").getTime / 1000 + slot * 60L,
      if (slot < k) 10.0 else 0.0)
    val df = rows.toDF("site", "epoch_s", "value")
      .selectExpr("site", "CAST(timestamp_seconds(epoch_s) AS TIMESTAMP) AS ts", "value")
    val out = QualityClusters.dbscanDayClusters(
        spark, df, "site", "ts", "value", eps = 0.06, minPts = 4)
      .collect()
      .map(r => r.getAs[String]("day") ->
        (r.getAs[Boolean]("is_core"), Option(r.getAs[String]("cluster_day"))))
      .toMap
    val aDays = Seq("2024-01-01", "2024-01-02", "2024-01-03", "2024-01-04")
    val bDays = Seq("2024-01-06", "2024-01-07", "2024-01-08", "2024-01-09")
    aDays.foreach { d =>
      assert(out(d)._1, s"$d should be core")
      assert(out(d)._2.contains("2024-01-01"), s"$d cluster ${out(d)._2}")
    }
    bDays.foreach { d =>
      assert(out(d)._1, s"$d should be core")
      assert(out(d)._2.contains("2024-01-06"), s"$d cluster ${out(d)._2}")
    }
    // the two-sided border: not core, attached to the MIN canonical
    // name among its adjacent clusters (A's, since 01-01 < 01-06)
    assert(!out("2024-01-05")._1, "P must not be core")
    assert(out("2024-01-05")._2.contains("2024-01-01"), s"P got ${out("2024-01-05")._2}")
    // noise: not core, null cluster
    assert(!out("2024-01-10")._1 && out("2024-01-10")._2.isEmpty)
  }
}
