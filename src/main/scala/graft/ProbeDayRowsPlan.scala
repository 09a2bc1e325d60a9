package graft

import org.apache.spark.sql.functions._

/** Dev utility: print the dayRows physical plan — verifies the
  * round-11 fusion (smoothness folded into the day-grain aggregate)
  * plans exactly one source scan for the window+agg subtree and no
  * Exchange between the Window and the HashAggregate.
  */
object ProbeDayRowsPlan {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local()
    val df = graft.sources.Tables.events(spark, "/root/testdata/sf0.001")
      .select(col("user_id").as("site"), col("ts"), col("value"))
    val rows = graft.analyses.Pipeline.dayRows(df, "site", "ts", "value")
    val plan = rows.queryExecution.executedPlan.toString
    println("[plan] exchanges=" + "Exchange hashpartitioning".r.findAllIn(plan).length)
    println("[plan] scans=" + "Scan parquet".r.findAllIn(plan).length)
    rows.explain("formatted")
    spark.stop()
  }
}
