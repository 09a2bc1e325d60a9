package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.Tables

/** CSV time-series source in the reference's data-plug shape
  * (`sdt_dask/dataplugs/csv_plug.py:23-33`).
  */
class CsvSourceSpec extends AnyFunSuite {

  test("JSONL documents round-trip; a corrupt line is captured, not fatal") {
    val spark = GraftSession.local("4")
    val dir = java.nio.file.Files.createTempDirectory("jsonl").toString
    val f = java.nio.file.Paths.get(dir, "part0.jsonl")
    java.nio.file.Files.write(f, java.util.Arrays.asList(
      """{"doc_id": 1, "text": "hello world", "lang": "en", "source": "s0", "n_chars": 11}""",
      """{"doc_id": 2, "text": "zweite zeile", "lang": "de", "source": "s1", "n_chars": 12}""",
      """this is not json at all""",
      """{"doc_id": 3, "text": "third", "lang": "en", "source": "s0", "n_chars": 5}"""
    ))
    val df = graft.sources.Tables.documentsJsonl(spark, dir).cache()
    val good = df.filter(org.apache.spark.sql.functions.col("_corrupt_record").isNull)
    val bad = df.filter(org.apache.spark.sql.functions.col("_corrupt_record").isNotNull)
    assert(good.count() == 3)
    assert(bad.count() == 1)
    assert(bad.head.getAs[String]("_corrupt_record").contains("not json"))
    val row = good.filter(org.apache.spark.sql.functions.col("doc_id") === 2).head
    assert(row.getAs[String]("text") == "zweite zeile" && row.getAs[String]("lang") == "de")
    df.unpersist()
  }
  lazy val spark: SparkSession = GraftSession.local("4")

  test("csvTimeSeries parses header + timestamps + float columns") {
    val dir = java.nio.file.Files.createTempDirectory("csvsrc")
    val f = dir.resolve("site.csv")
    java.nio.file.Files.writeString(f,
      """ts,power,temp
        |2024-01-01 00:00:00,0.0,10.5
        |2024-01-01 00:05:00,1.25,10.6
        |2024-01-01 00:10:00,2.5,10.7
        |""".stripMargin)
    val df = Tables.csvTimeSeries(spark, f.toString)
    assert(df.count() == 3)
    assert(df.schema("power").dataType.typeName == "double")
    assert(df.schema("ts").dataType.typeName.startsWith("timestamp"))
    val total = df.agg(org.apache.spark.sql.functions.sum("power")).collect()(0).getDouble(0)
    assert(total == 3.75)
  }
}
