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
    * first shuffle keyed by (keys, salt). Salt derives from a row
    * hash — deterministic, no RNG state.
    */
  def saltedSumCount(df: DataFrame, keys: Seq[String], valueCol: String, saltBuckets: Int): DataFrame = {
    val salted = df.withColumn("__salt", pmod(hash(col(valueCol)), lit(saltBuckets)))
    val partial = salted
      .groupBy((keys.map(col) :+ col("__salt")): _*)
      .agg(sum(col(valueCol)).as("__psum"), count(lit(1)).as("__pcnt"))
    partial
      .groupBy(keys.map(col): _*)
      .agg(sum(col("__psum")).as("sum_v"), sum(col("__pcnt")).cast("long").as("n"))
  }
}
