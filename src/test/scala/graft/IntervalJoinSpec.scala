package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.IntervalJoin

/** Semantics + plan-shape contracts for the point-in-interval join. */
class IntervalJoinSpec extends AnyFunSuite {
  lazy val spark: SparkSession = GraftSession.local("4")
  import spark.implicits._

  private def pts = Seq(
    (1L, 10.0, "a"),
    (1L, 20.0, "b"),
    (1L, 30.0, "c"),
    (2L, 10.0, "d")
  ).toDF("k", "t", "tag")

  private def ivs = Seq(
    (1L, 5.0, 15.0, "i1"),   // contains a
    (1L, 10.0, 30.0, "i2"),  // contains a (start-inclusive), b; NOT c (end-exclusive)
    (1L, 28.0, 29.0, "i3"),  // contains nothing
    (1L, 40.0, 35.0, "bad"), // inverted: matches nothing
    (3L, 0.0, 100.0, "i4")   // key absent from points
  ).toDF("k", "s", "e", "iv")

  test("half-open [start, end) band semantics with multi-match") {
    val out = IntervalJoin.pointInInterval(
        pts, ivs, Seq("k"), "t", "s", "e", Seq("iv"), bucketSeconds = 7.0)
      .select("tag", "iv").as[(String, String)].collect().toSet
    assert(out == Set(("a", "i1"), ("a", "i2"), ("b", "i2")),
      s"got $out — start must be inclusive, end exclusive, inverted intervals dropped")
  }

  test("bucket width does not change the result, only the plan economics") {
    for (b <- Seq(1.0, 3.0, 50.0, 1000.0)) {
      val out = IntervalJoin.pointInInterval(
          pts, ivs, Seq("k"), "t", "s", "e", Seq("iv"), bucketSeconds = b)
        .select("tag", "iv").as[(String, String)].collect().toSet
      assert(out == Set(("a", "i1"), ("a", "i2"), ("b", "i2")), s"bucket $b diverged: $out")
    }
  }

  test("plan is a bucketed equi-join — no nested-loop or cartesian join") {
    val plan = IntervalJoin.pointInInterval(
        pts, ivs, Seq("k"), "t", "s", "e", Seq("iv"), bucketSeconds = 7.0)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"))
    assert(!plan.contains("BroadcastNestedLoopJoin"))
  }

  test("randomized cross-check vs a brute-force reference (400 points × 150 intervals)") {
    val rnd = new scala.util.Random(7)
    val pRows = (0 until 400).map(i => (rnd.nextInt(4).toLong, rnd.nextInt(200).toDouble, i.toLong))
    val iRows = (0 until 150).map { i =>
      val s = rnd.nextInt(220).toDouble - 10.0
      (rnd.nextInt(4).toLong, s, s + rnd.nextInt(30).toDouble - 5.0, i.toLong) // some inverted/empty
    }
    val p = pRows.toDF("k", "t", "pid2")
    val iv = iRows.toDF("k", "s", "e", "iid2")
    val expect = (for {
      (pk, pt, pid) <- pRows
      (ik, s, e, iid) <- iRows
      if pk == ik && pt >= s && pt < e
    } yield (pid, iid)).sorted
    for (bucket <- Seq(3.0, 17.0, 500.0)) {
      val got = IntervalJoin.pointInInterval(
          p, iv, Seq("k"), "t", "s", "e", Seq("iid2"), bucketSeconds = bucket)
        .select("pid2", "iid2").as[(Long, Long)].collect().sorted
      assert(got.sameElements(expect),
        s"bucket $bucket diverged: got ${got.length}, expect ${expect.length}")
    }
  }

  test("empty interval frame yields an empty join, not an error") {
    val none = ivs.filter(col("k") === -1L)
    val out = IntervalJoin.pointInInterval(
      pts, none, Seq("k"), "t", "s", "e", Seq("iv"), bucketSeconds = 7.0)
    assert(out.count() == 0)
  }

  test("column collisions are rejected loudly") {
    val bad = ivs.withColumnRenamed("iv", "tag")
    val e = intercept[IllegalArgumentException] {
      IntervalJoin.pointInInterval(pts, bad, Seq("k"), "t", "s", "e", Seq("tag"), 7.0)
    }
    assert(e.getMessage.contains("collide"))
  }
}
