package graft

/** Dev entry: just Bench's pipeline-scale line (the full bench takes
  * minutes; this isolates the apples-to-apples baseline number).
  */
object BenchScale {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local()
    println(s"[benchscale] ${Bench.pipelineScaleLine(spark)}")
    spark.stop()
  }
}
