package graft

import graft.GraftSession

/** Plan-audit main: prints formatted physical plans for representative
  * queries so scan pruning / pushdown / join strategies / codegen
  * spans can be reviewed. Usage: runMain graft.Explain [names...]
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local("8")
    val dir = "/root/testdata/sf0.001"
    val names = if (args.nonEmpty) args.toSeq
    else Seq("q01_pricing_summary", "q04_revenue_by_nation", "q08_daily_density",
      "q14_asof_grid", "e01_cosine_topk", "q31_asof_backward")
    names.foreach { n =>
      println(s"\n========== $n ==========")
      SparkEntry.queries(n)(spark, dir).explain("formatted")
    }
    spark.stop()
  }
}
