package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.Tables

/** SQL face: the registered views expose the full table surface plus
  * the derived day_stats fact table to `spark.sql`, with the same
  * plans (pushdown, broadcasts) as the typed API.
  */
class SqlFaceSpec extends AnyFunSuite {
  lazy val spark: SparkSession = GraftSession.local("4")
  val dir = "/root/testdata/sf0.001"

  test("spark.sql can join the derived day_stats view with a base table") {
    Tables.registerViews(spark, dir)
    val out = spark.sql("""
      SELECT d.user_id, count(*) AS n_days,
             sum(CASE WHEN d.good_day THEN 1 ELSE 0 END) AS n_good
      FROM day_stats d
      GROUP BY d.user_id
      ORDER BY d.user_id
    """)
    assert(out.count() > 0)
    // matches the typed API result exactly
    val typed = graft.operators.DayStats
      .qualityFlags(Tables.events(spark, dir), "user_id", "ts", "value", 10L)
      .groupBy("user_id").count()
    assert(out.count() == typed.count())
  }

  test("spark.sql can triage the corpus through the doc_stats view") {
    Tables.registerViews(spark, dir)
    val out = spark.sql("""
      SELECT source, count(*) AS n_docs, sum(n_tokens) AS tot_tokens,
             round(avg(quality), 4) AS avg_quality
      FROM doc_stats
      GROUP BY source
    """).collect()
    assert(out.length > 1, "doc_stats should aggregate over multiple sources")
    assert(out.forall(r => r.getLong(2) > 0L), "token totals must be positive")
    // the fp column is a usable content join key: recomputing the
    // fingerprint from the base table in SQL matches every row
    val joined = spark.sql("""
      SELECT count(*) AS n
      FROM doc_stats s JOIN documents d
        ON s.doc_id = d.doc_id
       AND s.fp = md5(regexp_replace(lower(d.text), '[^a-z0-9]', ''))""")
      .collect().head.getLong(0)
    assert(joined == spark.table("documents").count())
  }

  test("spark.sql reaches the solver-grade clear_days view") {
    Tables.registerViews(spark, dir)
    val r = spark.sql(
      """SELECT count(*) AS n, sum(CASE WHEN clear THEN 1 ELSE 0 END) AS n_clear
         FROM clear_days""").collect().head
    assert(r.getLong(0) > 0, "clear_days view is empty")
    assert(r.getLong(1) >= 0 && r.getLong(1) <= r.getLong(0))
  }

  test("SQL over a base view keeps filter pushdown at the scan") {
    Tables.registerViews(spark, dir)
    val df = spark.sql("SELECT l_quantity FROM lineitem WHERE l_quantity > 40.0")
    val plan = df.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(plan.contains("PushedFilters: [IsNotNull(l_quantity), GreaterThan(l_quantity,40.0)]"), plan)
  }
}
