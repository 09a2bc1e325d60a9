package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.Tables

/** ORC source/sink round-trip: the engine must be format-agnostic at
  * the scan — identical data, identical operator results, and the
  * same pushdown contract (filters reaching the ORC scan) as parquet.
  */
class OrcSourceSpec extends AnyFunSuite {
  lazy val spark: SparkSession = GraftSession.local("4")

  test("events round-trip ORC with identical rows and identical day-stats results") {
    val events = Tables.events(spark, "/root/testdata/sf0.001")
      .select(col("user_id"), col("ts"), col("value"), col("event_type"))
    val path = java.nio.file.Files.createTempDirectory("orcrt").toString + "/events"
    Tables.writeOrc(events, path)
    val back = Tables.readOrc(spark, path)

    assert(back.schema == events.schema, s"schema drift: ${back.schema} vs ${events.schema}")
    val a = events.collect().map(_.toString).sorted
    val b = back.collect().map(_.toString).sorted
    assert(a.length == b.length && a.sameElements(b), "ORC round-trip changed rows")

    // an operator fed from ORC must produce byte-identical results
    def stats(df: org.apache.spark.sql.DataFrame) =
      graft.analyses.Pipeline.dayStats(
        df.select(col("user_id").as("site"), col("ts"), col("value")),
        "site", "ts", "value")
        .collect().map(_.toString).sorted
    assert(stats(events).sameElements(stats(back)), "day stats differ between formats")
  }

  test("filters push down to the ORC scan") {
    val events = Tables.events(spark, "/root/testdata/sf0.001")
      .select(col("user_id"), col("ts"), col("value"))
    val path = java.nio.file.Files.createTempDirectory("orcpd").toString + "/events"
    Tables.writeOrc(events, path)
    val plan = Tables.readOrc(spark, path)
      .filter(col("user_id") === 3L && col("value") > 10.0)
      .select(col("ts"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") &&
      (plan.contains("user_id") || plan.contains("IsNotNull")),
      s"no pushed filters in ORC scan:\n$plan")
    // column pruning: the scan must not read the value column beyond
    // the filter's needs — read schema carries only referenced fields
    assert(!plan.contains("event_type"), "pruned column leaked into the ORC scan")
  }
}
