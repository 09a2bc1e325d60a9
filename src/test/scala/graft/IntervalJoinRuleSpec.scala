package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The point-in-interval band-join rewrite: a naive
  * `keys = AND p >= s AND p < e` join must come back as a bucketed
  * equi-join — same rows, no nested-loop physical plan — for either
  * join orientation, any bucket width, and hostile intervals.
  */
class IntervalJoinRuleSpec extends AnyFunSuite {
  lazy val spark: SparkSession = GraftSession.local("4")
  import spark.implicits._

  private lazy val pts = (0L until 300L)
    .map(i => (i, i % 7, (i * 11 % 500).toDouble)).toDF("pid", "k", "pt")
  private lazy val ivs = ((0L until 150L).map { i =>
    (i, i % 7, (i * 17 % 500).toDouble, (i * 17 % 500).toDouble + (i % 40).toDouble)
  } ++ Seq(
    (900L, 3L, 100.0, 100.0), // empty [s, s)
    (901L, 3L, 200.0, 150.0)  // inverted
  )).toDF("iid", "k", "s", "e")

  private def q() = pts.join(ivs,
      pts("k") === ivs("k") && col("pt") >= col("s") && col("pt") < col("e"))
    .select(col("pid"), col("iid"))

  test("naive band join rewrites to a bucketed equi-join with identical rows") {
    val naive = q().collect().map(r => (r.getLong(0), r.getLong(1))).sorted
    assert(naive.nonEmpty)
    spark.experimental.extraOptimizations = Seq(graft.plans.IntervalJoinRule)
    try {
      for (bucket <- Seq("5", "40", "1000")) {
        spark.conf.set(graft.plans.IntervalJoinRule.BucketConfKey, bucket)
        val opt = q()
        val got = opt.collect().map(r => (r.getLong(0), r.getLong(1))).sorted
        val plan = opt.queryExecution.executedPlan.toString
        assert(!plan.contains("BroadcastNestedLoopJoin"), s"still nested-loop:\n$plan")
        assert(!plan.contains("CartesianProduct"), s"still cartesian:\n$plan")
        assert(got.sameElements(naive),
          s"bucket $bucket row mismatch: got ${got.length}, naive ${naive.length}")
      }
    } finally {
      spark.experimental.extraOptimizations = Nil
      spark.conf.unset(graft.plans.IntervalJoinRule.BucketConfKey)
    }
  }

  test("point-on-right orientation rewrites too") {
    def q2() = ivs.join(pts,
        ivs("k") === pts("k") && col("pt") >= col("s") && col("pt") < col("e"))
      .select(col("iid"), col("pid"))
    val naive = q2().collect().map(r => (r.getLong(0), r.getLong(1))).sorted
    spark.experimental.extraOptimizations = Seq(graft.plans.IntervalJoinRule)
    try {
      spark.conf.set(graft.plans.IntervalJoinRule.BucketConfKey, "25")
      val opt = q2()
      val got = opt.collect().map(r => (r.getLong(0), r.getLong(1))).sorted
      assert(!opt.queryExecution.executedPlan.toString.contains("BroadcastNestedLoopJoin"))
      assert(got.sameElements(naive))
    } finally {
      spark.experimental.extraOptimizations = Nil
      spark.conf.unset(graft.plans.IntervalJoinRule.BucketConfKey)
    }
  }

  test("band-only condition (no equi keys) also rewrites") {
    val a = (0L until 100L).map(i => (i, (i * 3 % 200).toDouble)).toDF("pid", "pt")
    val b = (0L until 50L).map(i => (i, (i * 4).toDouble, (i * 4 + 6).toDouble)).toDF("iid", "s", "e")
    def q3() = a.join(b, col("pt") >= col("s") && col("pt") < col("e"))
      .select(col("pid"), col("iid"))
    val naive = q3().collect().map(r => (r.getLong(0), r.getLong(1))).sorted
    spark.experimental.extraOptimizations = Seq(graft.plans.IntervalJoinRule)
    try {
      spark.conf.set(graft.plans.IntervalJoinRule.BucketConfKey, "10")
      val opt = q3()
      val got = opt.collect().map(r => (r.getLong(0), r.getLong(1))).sorted
      val plan = opt.queryExecution.executedPlan.toString
      assert(!plan.contains("BroadcastNestedLoopJoin"), s"still nested-loop:\n$plan")
      assert(got.sameElements(naive))
    } finally {
      spark.experimental.extraOptimizations = Nil
      spark.conf.unset(graft.plans.IntervalJoinRule.BucketConfKey)
    }
  }

  test("inclusive upper bound keeps the degenerate s == e interval match") {
    val a = Seq((1L, 100.0)).toDF("pid", "pt")
    val b = Seq((10L, 100.0, 100.0), (11L, 90.0, 110.0)).toDF("iid", "s", "e")
    def q4() = a.join(b, col("pt") >= col("s") && col("pt") <= col("e"))
      .select(col("pid"), col("iid"))
    val naive = q4().collect().map(r => (r.getLong(0), r.getLong(1))).sorted
    assert(naive.length == 2, "p == s == e must match a closed interval")
    spark.experimental.extraOptimizations = Seq(graft.plans.IntervalJoinRule)
    try {
      spark.conf.set(graft.plans.IntervalJoinRule.BucketConfKey, "7")
      val got = q4().collect().map(r => (r.getLong(0), r.getLong(1))).sorted
      assert(got.sameElements(naive), s"degenerate interval dropped: ${got.length}")
    } finally {
      spark.experimental.extraOptimizations = Nil
      spark.conf.unset(graft.plans.IntervalJoinRule.BucketConfKey)
    }
  }

  test("rule leaves non-matching joins untouched") {
    spark.experimental.extraOptimizations = Seq(graft.plans.IntervalJoinRule)
    try {
      val a = Seq((1L, 10.0), (2L, 20.0)).toDF("k", "v")
      val b = Seq((1L, 1.0), (3L, 3.0)).toDF("k2", "w")
      assert(a.join(b, col("k") === col("k2")).collect().length == 1)
      // one-sided band (lower bound only) must not rewrite, just run
      val c = Seq((1L, 5.0)).toDF("iid", "s")
      assert(a.join(c, col("v") >= col("s")).collect().length == 2)
    } finally spark.experimental.extraOptimizations = Nil
  }
}
