package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.AsOf

/** Semantics + plan-shape contracts for the generic as-of join. */
class AsOfSpec extends AnyFunSuite {
  lazy val spark: SparkSession = GraftSession.local("4")
  import spark.implicits._

  private def leftDf = Seq(
    (1L, 100L, "a"),
    (1L, 200L, "b"),
    (1L, 50L, "c"),   // before any right row
    (2L, 100L, "d"),  // key with no right rows at all
    (1L, 150L, "e")
  ).toDF("k", "t", "tag")

  private def rightDf = Seq(
    (1L, 100L, 10.0), // exact-tie with left "a"
    (1L, 140L, 14.0),
    (1L, 190L, 19.0),
    (3L, 100L, 99.0)  // key absent on the left
  ).toDF("k", "rt", "v")

  test("backward as-of attaches the latest right row at-or-before each left row") {
    val out = AsOf.join(leftDf, rightDf, Seq("k"), "t", "rt", Seq("v"))
      .select("tag", "v").as[(String, Option[Double])].collect().toMap
    assert(out("a").contains(10.0), "equality must match")
    assert(out("b").contains(19.0))
    assert(out("c").isEmpty, "left row before all right rows matches nothing")
    assert(out("d").isEmpty, "key with no right rows matches nothing")
    assert(out("e").contains(14.0))
  }

  test("forward as-of attaches the earliest right row at-or-after each left row") {
    val out = AsOf.join(leftDf, rightDf, Seq("k"), "t", "rt", Seq("v"),
        direction = "forward")
      .select("tag", "v").as[(String, Option[Double])].collect().toMap
    assert(out("a").contains(10.0), "equality must match")
    assert(out("b").isEmpty, "left row after all right rows matches nothing")
    assert(out("c").contains(10.0))
    assert(out("e").contains(19.0))
  }

  test("tolerance nulls far matches but keeps the left row") {
    val out = AsOf.join(leftDf, rightDf, Seq("k"), "t", "rt", Seq("v"),
        toleranceSeconds = Some(15.0))
      .select("tag", "v").as[(String, Option[Double])].collect().toMap
    assert(out.size == 5, "tolerance must not drop left rows")
    assert(out("a").contains(10.0)) // Δ=0
    assert(out("b").contains(19.0)) // Δ=10
    assert(out("e").contains(14.0)) // Δ=10
    assert(out("c").isEmpty && out("d").isEmpty)
  }

  test("null left ts matches nothing; right exact ties collapse to the struct-max payload") {
    val l = Seq((1L, Some(100L), "x"), (1L, None, "y")).toDF("k", "t", "tag")
    val r = Seq((1L, 90L, 1.0), (1L, 90L, 2.0)).toDF("k", "rt", "v")
    val out = AsOf.join(l, r, Seq("k"), "t", "rt", Seq("v"))
      .select("tag", "v").as[(String, Option[Double])].collect().toMap
    assert(out("x").contains(2.0), "tied right rows must collapse to the max payload")
    assert(out("y").isEmpty, "null-ts left row must match nothing")
  }

  test("timestamps keep sub-second precision and multi-column payload round-trips") {
    val l = Seq((1L, java.sql.Timestamp.valueOf("2024-01-01 00:00:01.5"), "a"))
      .toDF("k", "t", "tag")
    val r = Seq(
      (1L, java.sql.Timestamp.valueOf("2024-01-01 00:00:01.2"), 1.0, "hit"),
      (1L, java.sql.Timestamp.valueOf("2024-01-01 00:00:01.7"), 2.0, "late"))
      .toDF("k", "rt", "v", "lbl")
    val out = AsOf.join(l, r, Seq("k"), "t", "rt", Seq("v", "lbl"))
      .select("v", "lbl").collect()(0)
    assert(out.getDouble(0) == 1.0 && out.getString(1) == "hit",
      "sub-second ordering must pick the 1.2s row, not the 1.7s one")
  }

  test("plan is the one-shuffle union-window form — no nested-loop or cartesian join") {
    val plan = AsOf.join(leftDf, rightDf, Seq("k"), "t", "rt", Seq("v"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), "as-of must not plan a cartesian product")
    assert(!plan.contains("BroadcastNestedLoopJoin"), "as-of must not plan a nested loop")
    assert(plan.contains("Window"), "expected the ordered window carry")
  }

  test("randomized cross-check vs a brute-force reference (300 left × 200 right, ties and gaps)") {
    val rnd = new scala.util.Random(42)
    val lRows = (0 until 300).map(i => (rnd.nextInt(5).toLong, rnd.nextInt(50).toLong, i.toLong))
    val rRows = (0 until 200).map(i => (rnd.nextInt(5).toLong, rnd.nextInt(50).toLong, rnd.nextInt(1000).toDouble))
    val l = lRows.toDF("k", "t", "lid")
    val r = rRows.toDF("k", "rt", "v")
    // brute force: per (k, t) — max right ts <= t; ties collapse to max v
    val rBest = rRows.groupBy(x => (x._1, x._2)).map { case (kt, g) => (kt._1, kt._2, g.map(_._3).max) }.toSeq
    def expect(dir: String): Map[Long, Option[Double]] = lRows.map { case (k, t, lid) =>
      val cands =
        if (dir == "backward") rBest.filter(x => x._1 == k && x._2 <= t)
        else rBest.filter(x => x._1 == k && x._2 >= t)
      val best =
        if (cands.isEmpty) None
        else if (dir == "backward") Some(cands.maxBy(_._2)._3)
        else Some(cands.minBy(_._2)._3)
      lid -> best
    }.toMap
    for (dir <- Seq("backward", "forward")) {
      val got = AsOf.join(l, r, Seq("k"), "t", "rt", Seq("v"), direction = dir)
        .select("lid", "v").as[(Long, Option[Double])].collect().toMap
      val exp = expect(dir)
      assert(got.size == 300, s"$dir lost left rows")
      val bad = exp.collect { case (lid, e) if got(lid) != e => (lid, e, got(lid)) }
      assert(bad.isEmpty, s"$dir diverged from brute force: ${bad.take(5)}")
    }
  }

  test("empty right frame keeps every left row with null payload") {
    val r = rightDf.filter(col("k") === -1L)
    val out = AsOf.join(leftDf, r, Seq("k"), "t", "rt", Seq("v"))
      .select("tag", "v").as[(String, Option[Double])].collect().toMap
    assert(out.size == 5 && out.values.forall(_.isEmpty))
  }

  test("payload name collision with a left column is rejected loudly") {
    val r = rightDf.withColumnRenamed("v", "tag")
    val e = intercept[IllegalArgumentException] {
      AsOf.join(leftDf, r, Seq("k"), "t", "rt", Seq("tag"))
    }
    assert(e.getMessage.contains("collide"))
  }
}
