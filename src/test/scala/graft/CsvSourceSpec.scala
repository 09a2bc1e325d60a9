package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.Tables

/** CSV time-series source in the reference's data-plug shape
  * (`sdt_dask/dataplugs/csv_plug.py:23-33`).
  */
class CsvSourceSpec extends AnyFunSuite {
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
