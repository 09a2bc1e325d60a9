package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.Tables

/** Scale evidence (DESIGN §3): bucketing events by site makes the
  * site-keyed join shuffle-free — the layout a 100 TB deployment
  * would use so every `groupBy(site)`/join stage after the first
  * reuses the bucketed distribution.
  */
class BucketingSpec extends AnyFunSuite {
  lazy val spark: SparkSession = GraftSession.local("4")

  test("join of two tables bucketed by the same key plans with zero shuffles") {
    val ev = Tables.events(spark, "/root/testdata/sf0.001")
    spark.sql("DROP TABLE IF EXISTS ev_bucketed")
    spark.sql("DROP TABLE IF EXISTS agg_bucketed")
    ev.write.bucketBy(8, "user_id").sortBy("user_id").mode("overwrite").saveAsTable("ev_bucketed")
    ev.groupBy("user_id").agg(avg("value").as("site_avg"))
      .write.bucketBy(8, "user_id").mode("overwrite").saveAsTable("agg_bucketed")

    val joined = spark.table("ev_bucketed")
      .join(spark.table("agg_bucketed"), "user_id")
      .filter(col("value") > col("site_avg"))
    val plan = joined.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange hashpartitioning"), s"unexpected shuffle:\n$plan")
    assert(joined.count() > 0)

    // and the same join WITHOUT bucketing does shuffle — the layout is
    // what removes it, not the optimizer getting lucky
    val unbucketed = ev.join(ev.groupBy("user_id").agg(avg("value").as("site_avg")), "user_id")
    val plan2 = unbucketed.queryExecution.executedPlan.toString
    assert(plan2.contains("Exchange") || plan2.contains("Broadcast"), "control plan had no exchange at all")

    spark.sql("DROP TABLE IF EXISTS ev_bucketed")
    spark.sql("DROP TABLE IF EXISTS agg_bucketed")
  }
}
