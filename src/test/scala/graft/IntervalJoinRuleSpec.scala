package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The point-in-interval band-join rewrite: a naive
  * `keys = AND p >= s AND p < e` join must come back as a bucketed
  * equi-join — same rows, no nested-loop physical plan — for either
  * join orientation, any bucket width, and hostile intervals.
  *
  * GraftSession registers the rules by default, so each case collects
  * its NAIVE baseline with the optimizer rules disabled and restores
  * the session default afterwards (the session is shared across
  * suites via getOrCreate).
  */
class IntervalJoinRuleSpec extends AnyFunSuite {
  lazy val spark: SparkSession = GraftSession.local("4")
  import spark.implicits._

  private lazy val pts = (0L until 300L)
    .map(i => (i, i % 7, (i * 11 % 500).toDouble)).toDF("pid", "k", "pt")
  private lazy val ivs = ((0L until 150L).map { i =>
    (i, i % 7, (i * 17 % 500).toDouble, (i * 17 % 500).toDouble + (i % 40).toDouble)
  } ++ Seq(
    (900L, 3L, 100.0, 100.0), // empty [s, s) for strict upper bounds
    (901L, 3L, 200.0, 150.0)  // inverted
  )).toDF("iid", "k", "s", "e")

  private def pairs(df: DataFrame): Array[(Long, Long)] =
    df.collect().map(r => (r.getLong(0), r.getLong(1))).sorted

  private def naivePairs(df: => DataFrame): Array[(Long, Long)] = {
    val saved = spark.experimental.extraOptimizations
    spark.experimental.extraOptimizations = Nil
    try pairs(df) finally spark.experimental.extraOptimizations = saved
  }

  /** Run `body` with ONLY IntervalJoinRule active and a bucket width
    * set; `equiOptIn` also enables the equi+band rewrite scope. */
  private def withRule[T](bucket: String, equiOptIn: Boolean = false)(body: => T): T = {
    val saved = spark.experimental.extraOptimizations
    spark.experimental.extraOptimizations = Seq(graft.plans.IntervalJoinRule)
    spark.conf.set(graft.plans.IntervalJoinRule.BucketConfKey, bucket)
    if (equiOptIn)
      spark.conf.set(graft.plans.IntervalJoinRule.RewriteEquiConfKey, "true")
    try body finally {
      spark.experimental.extraOptimizations = saved
      spark.conf.unset(graft.plans.IntervalJoinRule.BucketConfKey)
      spark.conf.unset(graft.plans.IntervalJoinRule.RewriteEquiConfKey)
    }
  }

  private def q() = pts.join(ivs,
      pts("k") === ivs("k") && col("pt") >= col("s") && col("pt") < col("e"))
    .select(col("pid"), col("iid"))

  test("naive band join rewrites to a bucketed equi-join with identical rows") {
    val naive = naivePairs(q())
    assert(naive.nonEmpty)
    for (bucket <- Seq("5", "40", "1000")) withRule(bucket, equiOptIn = true) {
      val opt = q()
      val plan = opt.queryExecution.executedPlan.toString
      assert(!plan.contains("BroadcastNestedLoopJoin"), s"still nested-loop:\n$plan")
      assert(!plan.contains("CartesianProduct"), s"still cartesian:\n$plan")
      val got = pairs(opt)
      assert(got.sameElements(naive),
        s"bucket $bucket row mismatch: got ${got.length}, naive ${naive.length}")
    }
  }

  test("point-on-right orientation rewrites too") {
    def q2() = ivs.join(pts,
        ivs("k") === pts("k") && col("pt") >= col("s") && col("pt") < col("e"))
      .select(col("iid"), col("pid"))
    val naive = naivePairs(q2())
    withRule("25", equiOptIn = true) {
      val opt = q2()
      assert(!opt.queryExecution.executedPlan.toString.contains("BroadcastNestedLoopJoin"))
      assert(pairs(opt).sameElements(naive))
    }
  }

  test("band-only condition (no equi keys) also rewrites") {
    val a = (0L until 100L).map(i => (i, (i * 3 % 200).toDouble)).toDF("pid", "pt")
    val b = (0L until 50L).map(i => (i, (i * 4).toDouble, (i * 4 + 6).toDouble)).toDF("iid", "s", "e")
    def q3() = a.join(b, col("pt") >= col("s") && col("pt") < col("e"))
      .select(col("pid"), col("iid"))
    val naive = naivePairs(q3())
    withRule("10") {
      val opt = q3()
      val plan = opt.queryExecution.executedPlan.toString
      // the main path must be the bucketed equi-join; the ONLY nested
      // loop allowed is the explode-cap fallback branch, recognizable
      // by its barriered band condition (and empty on this data)
      assert(plan.contains("Generate"), s"lost the bucket explode:\n$plan")
      val bnlj = "BroadcastNestedLoopJoin[^\\n]*".r.findAllIn(plan).toSeq
      assert(bnlj.forall(_.contains("graft_barrier")),
        s"a non-fallback nested loop appeared:\n$plan")
      assert(pairs(opt).sameElements(naive))
    }
  }

  test("intervals wider than the explode cap take the guarded naive fallback, rows intact") {
    val a = (0L until 200L).map(i => (i, i.toDouble)).toDF("pid", "pt")
    // one sane interval + one open-ended sentinel that would explode
    // to ~2^58 buckets at width 10 without the cap
    val b = Seq(
      (1L, 20.0, 55.0),
      (2L, 0.0, 9.0e18)
    ).toDF("iid", "s", "e")
    def q5() = a.join(b, col("pt") >= col("s") && col("pt") < col("e"))
      .select(col("pid"), col("iid"))
    val naive = naivePairs(q5())
    assert(naive.count(_._2 == 2L) == 200, "sentinel interval must match every point")
    withRule("10") {
      // default cap (65536) — the sentinel would OOM without the split
      val opt = q5()
      val plan = opt.queryExecution.executedPlan.toString
      assert(plan.contains("Union"), s"expected the narrow/wide split:\n$plan")
      assert(plan.contains("graft_barrier"), s"fallback band must be barriered:\n$plan")
      assert(pairs(opt).sameElements(naive))
    }
  }

  test("explode cap <= 0 disables the guard: single-plan rewrite, no union branch") {
    val saved = spark.experimental.extraOptimizations
    spark.experimental.extraOptimizations = Seq(graft.plans.IntervalJoinRule)
    spark.conf.set(graft.plans.IntervalJoinRule.BucketConfKey, "10")
    spark.conf.set(graft.plans.IntervalJoinRule.MaxBucketsConfKey, "0")
    try {
      val a = (0L until 50L).map(i => (i, i.toDouble)).toDF("pid", "pt")
      val b = Seq((1L, 5.0, 25.0)).toDF("iid", "s", "e")
      val opt = a.join(b, col("pt") >= col("s") && col("pt") < col("e"))
        .select(col("pid"), col("iid"))
      val plan = opt.queryExecution.executedPlan.toString
      assert(!plan.contains("Union"), s"cap disabled must keep the single plan:\n$plan")
      assert(!plan.contains("BroadcastNestedLoopJoin"), s"still nested-loop:\n$plan")
      assert(opt.collect().length == 20)
    } finally {
      spark.experimental.extraOptimizations = saved
      spark.conf.unset(graft.plans.IntervalJoinRule.BucketConfKey)
      spark.conf.unset(graft.plans.IntervalJoinRule.MaxBucketsConfKey)
    }
  }

  test("fixed-point batch with predicate pushdown converges — one Generate, no stacking") {
    // the GraftExtensions deploy path runs the rule inside Spark's
    // fixed-point operator-optimization batch alongside
    // PushPredicateThroughJoin, which folds the rewrite's re-applied
    // band filter back into the join condition. Without the __ij_
    // guard the rule re-matched its own output every iteration,
    // stacking ~100 nested explodes. Reproduce that batch shape
    // directly with a RuleExecutor.
    import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
    import org.apache.spark.sql.catalyst.rules.RuleExecutor
    object FP extends RuleExecutor[LogicalPlan] {
      override val batches = Batch("fp", FixedPoint(100),
        org.apache.spark.sql.catalyst.optimizer.PushDownPredicates,
        graft.plans.IntervalJoinRule) :: Nil
    }
    withRule("40", equiOptIn = true) {
      val analyzed = q().queryExecution.analyzed
      val out = FP.execute(analyzed)
      val gens = out.collect {
        case g: org.apache.spark.sql.catalyst.plans.logical.Generate => g
      }
      assert(gens.length == 1,
        s"rule is not idempotent under fixed-point: ${gens.length} stacked Generates\n$out")
    }
  }

  test("inclusive upper bound keeps the degenerate s == e interval match") {
    val a = Seq((1L, 100.0)).toDF("pid", "pt")
    val b = Seq((10L, 100.0, 100.0), (11L, 90.0, 110.0)).toDF("iid", "s", "e")
    def q4() = a.join(b, col("pt") >= col("s") && col("pt") <= col("e"))
      .select(col("pid"), col("iid"))
    val naive = naivePairs(q4())
    assert(naive.length == 2, "p == s == e must match a closed interval")
    withRule("7") {
      val got = pairs(q4())
      assert(got.sameElements(naive), s"degenerate interval dropped: ${got.length}")
    }
  }

  test("equi+band joins are NOT rewritten by default — hash join with residual wins there") {
    withRule("40") {
      val opt = q()
      val plan = opt.queryExecution.executedPlan.toString
      assert(!plan.contains("Generate"), s"default scope must leave equi+band joins alone:\n$plan")
    }
  }

  test("rule leaves non-matching joins untouched") {
    withRule("86400") {
      val a = Seq((1L, 10.0), (2L, 20.0)).toDF("k", "v")
      val b = Seq((1L, 1.0), (3L, 3.0)).toDF("k2", "w")
      assert(a.join(b, col("k") === col("k2")).collect().length == 1)
      // one-sided band (lower bound only) must not rewrite, just run
      val c = Seq((1L, 5.0)).toDF("iid", "s")
      assert(a.join(c, col("v") >= col("s")).collect().length == 2)
    }
  }
}
