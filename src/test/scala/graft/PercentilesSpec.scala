package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Percentiles

/** Bit-parity contract for the exact-percentile replacements: both
  * [[Percentiles.exactByHistogram]] (histogram-prune, the default)
  * and [[Percentiles.exactBySort]] (single-shuffle sort selection)
  * must reproduce Spark's `percentile` aggregate BIT-FOR-BIT on every
  * distribution shape — swapping implementations must change zero
  * output bits anywhere in the engine.
  */
class PercentilesSpec extends AnyFunSuite {
  lazy val spark: SparkSession = GraftSession.local("4")
  import spark.implicits._

  private def check(rows: Seq[(Long, java.lang.Double)], pct: Double, clue: String): Unit = {
    val df = rows.toDF("g", "v")
    val oracle = df.filter(col("v").isNotNull).groupBy(col("g"))
      .agg(percentile(col("v"), lit(pct)).as("p"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val hist: (org.apache.spark.sql.DataFrame, String, String, Double, String) => org.apache.spark.sql.DataFrame =
      Percentiles.exactByHistogram(_, _: String, _, _, _)
    val srt: (org.apache.spark.sql.DataFrame, String, String, Double, String) => org.apache.spark.sql.DataFrame =
      Percentiles.exactBySort(_, _: String, _, _, _)
    for ((name, impl) <- Seq("histogram" -> hist, "sort" -> srt)) {
      val got = impl(df, "g", "v", pct, "p")
        .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
      assert(got.keySet == oracle.keySet, s"$clue/$name groups")
      for ((g, exp) <- oracle) {
        val o = got(g)
        assert(java.lang.Double.doubleToLongBits(o) == java.lang.Double.doubleToLongBits(exp),
          s"$clue/$name g=$g: got $o expected $exp")
      }
    }
  }

  test("continuous values, several groups, several percentiles") {
    val rows = for (g <- 1L to 3L; i <- 0 until 257) yield
      (g, java.lang.Double.valueOf(math.sin(i * 12.9898 + g) * 53.17 + g))
    for (p <- Seq(0.0, 0.05, 0.5, 0.95, 1.0)) check(rows, p, s"continuous p=$p")
  }

  test("heavy ties and point masses (night zeros shape)") {
    // 90% exact zeros: p95 straddles the dense region above the mass
    val rows = for (g <- 1L to 2L; i <- 0 until 400) yield
      (g, java.lang.Double.valueOf(if (i < 360) 0.0 else 1.0 + i * 0.25))
    for (p <- Seq(0.5, 0.89, 0.9, 0.95)) check(rows, p, s"pointmass p=$p")
  }

  test("negatives, tiny magnitudes, and cross-bin interpolation") {
    val rows = for (g <- 1L to 2L; i <- 0 until 100) yield
      (g, java.lang.Double.valueOf((i - 50) * 1.7e-9 * (g + i % 7)))
    for (p <- Seq(0.25, 0.5, 0.95)) check(rows, p, s"negatives p=$p")
  }

  test("tiny groups: n=1 and n=2") {
    check(Seq((1L, java.lang.Double.valueOf(42.5))), 0.95, "n1")
    check(Seq((1L, java.lang.Double.valueOf(1.0)), (1L, java.lang.Double.valueOf(2.0))), 0.95, "n2")
  }

  test("nulls are skipped like the percentile aggregate") {
    val rows: Seq[(Long, java.lang.Double)] =
      Seq((1L, null), (1L, java.lang.Double.valueOf(3.0)), (1L, java.lang.Double.valueOf(9.0)), (1L, null))
    check(rows, 0.95, "nulls")
  }

  test("multi-percentile form: every level bit-equals the aggregate, min/max ride as 0.0/1.0") {
    val rows = for (g <- 1L to 2L; i <- 0 until 311) yield
      (g, java.lang.Double.valueOf(math.cos(i * 7.77 + g) * 19.3 - g * 0.5))
    val df = rows.toDF("g", "v")
    val levels = Seq(0.0 -> "mn", 0.05 -> "p05", 0.5 -> "p50", 0.95 -> "p95", 1.0 -> "mx")
    val got = Percentiles.exactByHistogram(df, Seq("g"), "v", levels)
      .collect().map(r => r.getLong(0) -> levels.indices.map(i => r.getDouble(i + 1))).toMap
    val oracle = df.groupBy(col("g"))
      .agg(levels.map { case (p, n) => percentile(col("v"), lit(p)).as(n) }.head,
        levels.tail.map { case (p, n) => percentile(col("v"), lit(p)).as(n) }: _*)
      .collect().map(r => r.getLong(0) -> levels.indices.map(i => r.getDouble(i + 1))).toMap
    assert(got.keySet == oracle.keySet)
    for ((g, exp) <- oracle; i <- levels.indices)
      assert(java.lang.Double.doubleToLongBits(got(g)(i)) == java.lang.Double.doubleToLongBits(exp(i)),
        s"g=$g level=${levels(i)._2}: got ${got(g)(i)} expected ${exp(i)}")
    // 0.0 / 1.0 are exact min / max
    val mm = df.groupBy(col("g")).agg(min(col("v")), max(col("v")))
      .collect().map(r => r.getLong(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    for ((g, (mn, mx)) <- mm) {
      assert(got(g).head == mn, s"p=0.0 must be min for g=$g")
      assert(got(g).last == mx, s"p=1.0 must be max for g=$g")
    }
  }

  test("multi-group-column grouping keys are preserved") {
    val rows = for (a <- 1L to 2L; b <- Seq("x", "y"); i <- 0 until 40) yield
      (a, b, java.lang.Double.valueOf(i * 0.3 + a + b.length))
    val df = rows.toDF("a", "b", "v")
    val got = Percentiles.exactByHistogram(df, Seq("a", "b"), "v", Seq(0.95 -> "p"))
    assert(got.columns.toSeq == Seq("a", "b", "p"))
    assert(got.count() == 4)
    val oracle = df.groupBy(col("a"), col("b")).agg(percentile(col("v"), lit(0.95)).as("p"))
    assert(got.join(oracle, Seq("a", "b")).filter(got("p") =!= oracle("p")).count() == 0)
  }

  test("routing: scan-shaped inputs (leaf + project/filter) prefer histogram") {
    val dir = java.nio.file.Files.createTempDirectory("pctroute").toString
    val base = (1L to 200L).map(i => (i % 4, i * 0.5)).toDF("g", "v")
    base.write.mode("overwrite").parquet(dir)
    val scan = spark.read.parquet(dir)
    assert(Percentiles.preferHistogram(scan), "parquet scan")
    assert(Percentiles.preferHistogram(scan.filter(col("v") > 3).select(col("g"), col("v"))),
      "filter+project over scan")
    assert(Percentiles.preferHistogram(base), "local relation")
    assert(Percentiles.preferHistogram(scan.unionByName(scan)), "union of scans")
  }

  test("routing: derived subtrees (aggregate/window/join/repartition) prefer sort") {
    val df = (1L to 200L).map(i => (i % 4, i * 0.5)).toDF("g", "v")
    val agg = df.groupBy(col("g")).agg(sum(col("v")).as("v"))
    assert(!Percentiles.preferHistogram(agg), "aggregate subtree")
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("g")).orderBy(col("v"))
    assert(!Percentiles.preferHistogram(df.withColumn("r", row_number().over(w))), "window subtree")
    assert(!Percentiles.preferHistogram(df.join(agg.select(col("g")), Seq("g"))), "join subtree")
    assert(!Percentiles.preferHistogram(df.repartition(8)), "repartition subtree")
  }

  test("routing: non-deterministic input MUST take the single-evaluation sort route") {
    // over a real scan: the optimizer cannot fold the rand() away
    // (over a LocalRelation it may materialize the rows into the
    // leaf, which is then legitimately safe to re-scan)
    val dir = java.nio.file.Files.createTempDirectory("pctroutend").toString
    (1L to 50L).map(i => (i % 2, i * 1.0)).toDF("g", "v").write.mode("overwrite").parquet(dir)
    val nd = spark.read.parquet(dir).withColumn("v", col("v") + rand(7))
    assert(!Percentiles.preferHistogram(nd))
  }

  test("routing: a persisted derived pipeline routes to histogram (cached leaf)") {
    val df = (1L to 200L).map(i => (i % 4, i * 0.5)).toDF("g", "v")
    val derived = df.groupBy(col("g"), (col("v") % 10).as("b")).agg(sum(col("v")).as("v"))
    derived.persist()
    try {
      derived.count()
      assert(Percentiles.preferHistogram(derived), "cache substitution makes re-scan cheap")
    } finally derived.unpersist(blocking = true)
  }

  test("self-routing exact: both routes produce the aggregate's bits on the same call") {
    val rows = for (g <- 1L to 2L; i <- 0 until 123) yield
      (g, java.lang.Double.valueOf(math.sin(i * 3.3 + g) * 11.1))
    val df = rows.toDF("g", "v")
    val oracle = df.groupBy(col("g")).agg(percentile(col("v"), lit(0.95)).as("p"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // scan-shaped (histogram route) and window-derived (sort route)
    // inputs of identical content must agree with the aggregate
    // rk stays in the projection: selecting only (g, v) would let
    // column pruning delete the unused Window from the optimized plan,
    // silently turning this input scan-shaped and losing the
    // sort-route coverage (ADVICE r12)
    val derived = df.withColumn("rk",
      row_number().over(org.apache.spark.sql.expressions.Window.partitionBy(col("g")).orderBy(col("v"))))
    assert(Percentiles.preferHistogram(df), "scan-shaped input must take the histogram route")
    assert(!Percentiles.preferHistogram(derived), "window-derived input must take the sort route")
    for ((clue, in) <- Seq("scanshape" -> df, "derived" -> derived)) {
      val got = Percentiles.exact(in, Seq("g"), "v", Seq(0.95 -> "p"))
        .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
      assert(got.keySet == oracle.keySet, clue)
      for ((g, exp) <- oracle)
        assert(java.lang.Double.doubleToLongBits(got(g)) == java.lang.Double.doubleToLongBits(exp),
          s"$clue g=$g")
    }
  }

  test("adjacent order statistics land in different bins") {
    // values far apart in magnitude: floor/ceil ranks straddle a bin
    // boundary for p between the two clusters
    val rows = (Seq.fill(10)(1.0) ++ Seq.fill(10)(1.0e6)).zipWithIndex
      .map { case (v, _) => (1L, java.lang.Double.valueOf(v)) }
    check(rows, 0.5, "binstraddle") // pos = 9.5 → ranks 10 (1.0) and 11 (1e6)
  }
}
