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

  test("payload name collision with a left column is rejected loudly") {
    val r = rightDf.withColumnRenamed("v", "tag")
    val e = intercept[IllegalArgumentException] {
      AsOf.join(leftDf, r, Seq("k"), "t", "rt", Seq("tag"))
    }
    assert(e.getMessage.contains("collide"))
  }
}
