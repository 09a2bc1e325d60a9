package graft

import org.apache.spark.sql.functions._

/** Dev-only stage timer for the RAW-matrix study path (q61/q62/q99 —
  * optimization round 13): times each composition stage in isolation,
  * warm (second rep), to locate where the 3 s of q61 goes.
  */
object ProfStudyRaw {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = GraftSession.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    spark.sparkContext.setLogLevel("WARN")
    val ev = graft.sources.Tables.events(spark, dir)
    def time(name: String)(f: => Long): Unit =
      (1 to 2).foreach { rep =>
        System.gc()
        val t0 = System.nanoTime()
        val n = f
        println(f"[profraw] $name%-30s rep$rep ${(System.nanoTime() - t0) / 1e9}%8.2f s  ($n rows)")
      }
    time("warmup count")(ev.count())
    time("inferFrequency") {
      graft.operators.TimeAxis.inferFrequency(ev, Seq("user_id"), "ts").count()
    }
    val rows = graft.analyses.Study.studyRows(spark, ev, "user_id", "ts", "value",
      includeFilled = false, includeRaw = true)
    time("studyRows(raw)")(rows.count())
    time("scaleParams")(graft.analyses.Study.scaleParams(rows).count())
    time("dayGrain(raw)") {
      graft.analyses.Study.dayGrain(spark, ev, "user_id", "ts", "value",
        includeFilled = false, includeRaw = true).count()
    }
    time("clearDay.detect(96)") {
      graft.analyses.ClearDay.detect(spark, ev, "user_id", "ts", "value", 96).count()
    }
    time("latitudeStudy(raw)") {
      graft.analyses.Study.latitudeStudy(spark, ev, "user_id", "ts", "value",
        includeFilled = false).count()
    }
    time("longitudeStudy(raw, 3est)") {
      graft.analyses.Study.longitudeStudy(spark, ev, "user_id", "ts", "value",
        includeFilled = false, estimators = Seq("calculated", "fit_l1", "fit_l2")).count()
    }
    spark.stop()
  }
}
