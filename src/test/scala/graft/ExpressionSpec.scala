package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.GraftFunctions

/** Native Catalyst expression: semantics + registration + codegen. */
class ExpressionSpec extends AnyFunSuite {
  lazy val spark: SparkSession = GraftSession.local("4")
  import spark.implicits._

  test("graft_round_to_base matches round(x/b)*b exactly, including ties and negatives") {
    GraftFunctions.register(spark)
    val vals = Seq(0.0, 5.0, -5.0, 14.999, 15.0, 15.001, -15.0, 123.456, 2.5, -2.5, 7.5)
    val df = vals.toDF("x")
    val out = df
      .select(
        expr("graft_round_to_base(x, 10.0)").as("custom"),
        (round(col("x") / 10.0) * 10.0).as("builtin")
      )
      .as[(Double, Double)]
      .collect()
    out.foreach { case (c, b) => assert(c == b, s"$c != $b") }
  }

  test("works from SQL over a large frame (whole-stage codegen path)") {
    GraftFunctions.register(spark)
    spark.range(100000).selectExpr("CAST(id AS DOUBLE) / 7 AS x").createOrReplaceTempView("t")
    val n = spark.sql(
      "SELECT count(*) FROM t WHERE graft_round_to_base(x, 5.0) <> round(x / 5.0, 0) * 5.0"
    ).as[Long].head()
    assert(n == 0L)
  }
}
