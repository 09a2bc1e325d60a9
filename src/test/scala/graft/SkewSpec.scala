package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Scale evidence (DESIGN §3): AQE's skew-join handling splits a hot
  * key's oversized partitions at runtime — the engine's answer (along
  * with salting, q40) to a single dominating site in a fleet join.
  */
class SkewSpec extends AnyFunSuite {

  test("AQE splits the hot key's partition in a skewed sort-merge join") {
    val spark = SparkSession.builder()
      .master("local[4]")
      .appName("graft-skew")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      // thresholds sized so the synthetic hot key trips skew handling
      .config("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
      .config("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "64KB")
      .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "32KB")
      // force sort-merge: skew splitting applies to SMJ, not broadcast
      .config("spark.sql.autoBroadcastJoinThreshold", "-1")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    try {
      import spark.implicits._
      // 1 hot key with 200k rows, 99 keys with 200 rows each
      val left = spark.range(0, 200000).select(lit(0L).as("k"), col("id").as("v"))
        .unionByName(spark.range(0, 19800).select((col("id") % 99 + 1).as("k"), col("id").as("v")))
      val right = spark.range(0, 100).select(col("id").as("k"), (col("id") * 2).as("w"))
      val joined = left.join(right, "k")
      // collect() executes THIS DataFrame's own QueryExecution (count()
      // or a write would build and execute a separate plan instance)
      assert(joined.collect().length == 200000 + 19800)
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("isFinalPlan=true"), "AQE did not finalize")
      assert(plan.contains("skew=true"), s"no skew split in final plan:\n$plan")
    } finally spark.stop()
  }
}
