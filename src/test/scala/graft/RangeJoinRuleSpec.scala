package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The nearest-ts range-join rewrite (SURVEY §7.4's Catalyst-rule
  * candidate): a naive `abs(l − r) <= d` join must come back as a
  * bucketed equi-join — same rows, no nested-loop physical plan.
  */
class RangeJoinRuleSpec extends AnyFunSuite {
  lazy val spark: SparkSession = GraftSession.local("4")
  import spark.implicits._

  test("naive abs-range join rewrites to a bucketed equi-join with identical rows") {
    val a = (0L until 500L).map(i => (i, (i * 7 % 1000).toDouble)).toDF("aid", "ae")
    val b = (0L until 400L).map(i => (i, (i * 13 % 1000).toDouble)).toDF("bid", "be")
    def q() = a.join(b, abs(col("ae") - col("be")) <= lit(3.0)).select(col("aid"), col("bid"))

    val __saved = spark.experimental.extraOptimizations
    spark.experimental.extraOptimizations = Nil
    val naive = q().collect().map(r => (r.getLong(0), r.getLong(1))).sorted
    assert(naive.nonEmpty)

    spark.experimental.extraOptimizations = Seq(graft.plans.RangeJoinRule)
    try {
      val opt = q()
      val got = opt.collect().map(r => (r.getLong(0), r.getLong(1))).sorted
      val plan = opt.queryExecution.executedPlan.toString
      assert(!plan.contains("BroadcastNestedLoopJoin"), s"still nested-loop:\n$plan")
      assert(!plan.contains("CartesianProduct"), s"still cartesian:\n$plan")
      assert(got.sameElements(naive), s"row mismatch: got ${got.length}, naive ${naive.length}")
    } finally spark.experimental.extraOptimizations = __saved
  }

  test("flipped abs orientation (right − left) with a broadcast hint rewrites correctly") {
    // regression: the swapped branch passed the bucket expressions
    // crossed, leaving each side's bucket computed from the OTHER
    // side's column — unresolved plan the moment the rule met an
    // abs(right − left) join (found when the rule went session-default)
    val a = (0L until 200L).map(i => (i, (i * 7 % 300).toDouble)).toDF("aid", "ae")
    val b = (0L until 150L).map(i => (i, (i * 13 % 300).toDouble)).toDF("bid", "be")
    def q2() = a.join(broadcast(b), abs(col("be") - col("ae")) <= lit(4.0))
      .select(col("aid"), col("bid"))
    val __saved = spark.experimental.extraOptimizations
    spark.experimental.extraOptimizations = Nil
    val naive = q2().collect().map(r => (r.getLong(0), r.getLong(1))).sorted
    assert(naive.nonEmpty)
    spark.experimental.extraOptimizations = Seq(graft.plans.RangeJoinRule)
    try {
      val opt = q2()
      val got = opt.collect().map(r => (r.getLong(0), r.getLong(1))).sorted
      val plan = opt.queryExecution.executedPlan.toString
      assert(!plan.contains("BroadcastNestedLoopJoin"), s"still nested-loop:\n$plan")
      assert(got.sameElements(naive), s"row mismatch: got ${got.length}, naive ${naive.length}")
    } finally spark.experimental.extraOptimizations = __saved
  }

  test("rule leaves non-matching joins untouched") {
    val __saved = spark.experimental.extraOptimizations
    spark.experimental.extraOptimizations = Seq(graft.plans.RangeJoinRule)
    try {
      val a = Seq((1L, 10.0), (2L, 20.0)).toDF("k", "v")
      val b = Seq((1L, 1.0), (3L, 3.0)).toDF("k2", "w")
      val out = a.join(b, col("k") === col("k2")).collect()
      assert(out.length == 1)
    } finally spark.experimental.extraOptimizations = __saved
  }
}
