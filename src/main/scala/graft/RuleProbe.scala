package graft

import org.apache.spark.sql.functions._

/** Dev-only probes for the join-rewrite rules.
  *
  *  - reproduces the RangeJoinRule flipped-orientation binding bug
  *    (fixed; kept as the regression's origin story), and
  *  - measures the nested-loop vs bucketed-plan gap that justifies
  *    IntervalJoinRule at scale.
  */
object RuleProbe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local()
    import spark.implicits._

    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[ruleprobe] $name%-34s ${(System.nanoTime() - t0) / 1e9}%8.2f s  ($n rows)")
    }

    // the flipped-orientation regression shape (now rewrites cleanly)
    val dayDf = (0 until 50).map(i => (i, i * 1.0)).toDF("i", "tc1")
    val flipped = dayDf.as("a")
      .join(broadcast(dayDf.select(col("i").as("j"), col("tc1").as("tc2"))),
        abs(col("j") - col("i")) <= 20)
    time("flipped abs self-join")(flipped.count())

    // nested-loop vs bucketed gap: 1M points × 50k 10-min intervals,
    // one shared key space (pure band — the rule's default scope).
    // The naive broadcast NLJ is 5e10 comparisons; the bucketed plan
    // touches only per-bucket candidates.
    val pts = spark.range(1000000L)
      .select(col("id").as("pid"), (col("id") * 37 % 864000).cast("double").as("pt"))
    val ivs = spark.range(50000L)
      .select(col("id").as("iid"),
        (col("id") * 863 % 860000).cast("double").as("s"))
      .withColumn("e", col("s") + 600.0)
    def band() = pts.join(ivs, col("pt") >= col("s") && col("pt") < col("e"))

    spark.conf.set(graft.plans.IntervalJoinRule.BucketConfKey, "600")
    time("band join WITH IntervalJoinRule")(band().count())
    time("  (warm repeat)")(band().count())

    val saved = spark.experimental.extraOptimizations
    spark.experimental.extraOptimizations = Nil
    time("band join NAIVE (nested loop)")(band().count())
    spark.experimental.extraOptimizations = saved
    spark.conf.unset(graft.plans.IntervalJoinRule.BucketConfKey)
    spark.stop()
  }
}
