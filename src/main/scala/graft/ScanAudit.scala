package graft

/** Dev utility: executed-plan scan counts for every query (flags
  * redundant aggregation branches that re-scan the fact table).
  */
object ScanAudit {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local("8")
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (n, fn) =>
      try {
        val df = fn(spark, dir)
        df.collect()
        val p = df.queryExecution.executedPlan.toString
        val scans = "Scan parquet".r.findAllIn(p).length
        if (scans >= 4) println(s"[scans] $n $scans")
      } catch { case scala.util.control.NonFatal(e) => println(s"[scans] $n ERR ${e.getMessage.take(60)}") }
    }
    spark.stop()
  }
}
