package graft

/** Dev utility: print a query's formatted physical plan by name. */
object ProfPlan {
  def main(args: Array[String]): Unit = {
    val pos = args.filterNot(_.startsWith("--"))
    val name = pos(0)
    val dir = if (pos.length > 1) pos(1) else "/root/testdata/sf0.001"
    val spark = GraftSession.local("4")
    spark.sparkContext.setLogLevel("WARN")
    val df = SparkEntry.queries(name)(spark, dir)
    if (args.contains("--exec")) df.collect()
    println(df.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted")))
    spark.stop()
  }
}
