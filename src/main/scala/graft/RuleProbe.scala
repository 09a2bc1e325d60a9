package graft

import org.apache.spark.sql.functions._

/** Dev-only repro for the RangeJoinRule broadcast self-join binding bug. */
object RuleProbe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local("4")
    import spark.implicits._
    val dayDf = (0 until 50).map(i => (i, i * 1.0, i * 2.0, i * 3.0))
      .toDF("i", "tc1", "de1", "dens")
    val fits = dayDf.as("a")
      .join(broadcast(dayDf.select(col("i").as("j"), col("tc1").as("tc2"),
        col("de1").as("de2"), col("dens").as("dn2"))),
        abs(col("j") - col("i")) <= 20)
      .groupBy(col("i"), col("tc1"), col("de1"), col("dens"))
      .agg(percentile(col("tc2"), lit(0.9)).as("tc_fit"))
    try {
      println("[ruleprobe] rows = " + fits.count())
      println(fits.queryExecution.executedPlan.toString.take(3000))
    } catch {
      case e: Throwable =>
        println("[ruleprobe] FAILED: " + e.getMessage)
        println(fits.queryExecution.optimizedPlan.toString.take(5000))
    }
    spark.stop()
  }
}
