package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** Skew mitigation: two-phase salted aggregation. A hot key's rows
  * spread over `saltBuckets` partial groups (phase 1, map-side
  * friendly), then partials merge per real key (phase 2). Use when a
  * single site/key dominates a 100 TB aggregation; algebraic
  * aggregates only.
  */
object Salting {

  /** Salted sum/count aggregation: equivalent to
    * `df.groupBy(keys).agg(sum(valueCol), count(*))` but with the
    * first shuffle keyed by (keys, salt). Salt hashes ALL columns of
    * the row — deterministic (no RNG state) yet row-diverse, so a hot
    * key whose rows share one value (e.g. long runs of 0.0 night
    * readings) still spreads across all buckets; hashing only the
    * value column would collapse such rows into a single bucket and
    * defeat the salt.
    */
  def saltedSumCount(df: DataFrame, keys: Seq[String], valueCol: String, saltBuckets: Int): DataFrame = {
    val salted = df.withColumn("__salt", pmod(hash(df.columns.map(col): _*), lit(saltBuckets)))
    val partial = salted
      .groupBy((keys.map(col) :+ col("__salt")): _*)
      .agg(sum(col(valueCol)).as("__psum"), count(lit(1)).as("__pcnt"))
    partial
      .groupBy(keys.map(col): _*)
      .agg(sum(col("__psum")).as("sum_v"), sum(col("__pcnt")).cast("long").as("n"))
  }
}
