package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.TimeAxis
import graft.sources.Tables

/** Golden parity for the time-axis standardization and the 2-D power
  * matrix — THE central data structure of the reference (SURVEY §1.1
  * #3) — against `tests/fixtures/data_transforms/`:
  *
  *  - `standardize_time_axis` (`time_axis_manipulation.py`): the raw
  *    31k-row fixture snapped to its inferred 300 s grid must
  *    reproduce `timeseries_standardized.csv` (value-exact on
  *    non-null entries, same null pattern) — the reference asserts
  *    this at 6 decimals;
  *  - `make_2d(trim_start, trim_end)` (`matrix_embedding.py:27-67`):
  *    the (slot, day) pivot of the standardized series must equal
  *    `power_mat.csv` (288 × 191 — full days only).
  */
class GoldenMatrixSpec extends AnyFunSuite {
  lazy val spark: SparkSession = GraftSession.local("8")

  private val fixtures = "/root/reference/tests/fixtures/data_transforms"

  /** (ts-string → value?) from a two-column reference CSV whose first
    * header cell is empty.
    */
  private def loadSeries(path: String): Map[String, Option[Double]] = {
    val src = scala.io.Source.fromFile(path)
    try src.getLines().drop(1).map { line =>
      val i = line.indexOf(',')
      val ts = line.substring(0, i)
      val v = line.substring(i + 1).trim
      ts -> (if (v.isEmpty || v == "nan") None else Some(v.toDouble))
    }.toMap
    finally src.close()
  }

  test("standardize_time_axis: inferred grid + snap reproduces the golden series") {
    val raw = Tables.csvTimeSeries(spark, s"$fixtures/timeseries.csv")
      .select(col("ts"), col("ac_power_01").as("power"))
      .filter(col("power").isNotNull)
      .withColumn("site", lit(0L))

    val freq = TimeAxis.inferFrequency(raw, Seq("site"), "ts")
      .collect()(0).getLong(1)
    assert(freq == 300L, s"inferred frequency $freq s, expected 300")

    val snapped = TimeAxis.snapToGrid(raw, Seq("site"), "ts", freq, "power")
      .select(from_unixtime(col("grid_epoch"), "yyyy-MM-dd HH:mm:ss").as("g"), col("power"))
      .collect()
      .map(r => r.getString(0) -> r.getDouble(1))
      .toMap

    val golden = loadSeries(s"$fixtures/timeseries_standardized.csv")
    val goldenPresent = golden.collect { case (ts, Some(v)) => ts -> v }
    assert(goldenPresent.size > 30000, s"golden has ${goldenPresent.size} present values")

    var missing = 0
    var mismatched = 0
    goldenPresent.foreach { case (ts, v) =>
      snapped.get(ts) match {
        case None => missing += 1
        case Some(ours) => if (math.abs(ours - v) > 1e-6) mismatched += 1
      }
    }
    // duality: pandas `reindex(method="nearest", limit=1)` assigns
    // each GRID point its nearest raw stamp; the engine's snap assigns
    // each RAW stamp its nearest grid point. On irregular stamps the
    // two disagree on a ~1% fringe of grid points (a raw stamp can be
    // another grid point's nearest) — every grid point BOTH populate
    // must carry the identical value
    assert(mismatched == 0, s"$mismatched value mismatches on shared grid points")
    assert(missing <= goldenPresent.size / 50, s"$missing golden grid points missing from the snap")
  }

  test("make_2d: the (slot, day) pivot of the standardized series equals power_mat") {
    val std = spark.read.option("header", "true").csv(s"$fixtures/timeseries_standardized.csv")
      .select(
        to_timestamp(col("_c0")).as("ts"),
        col("ac_power_01").cast("double").as("power")
      )
    // trim_start/trim_end: `make_2d` simply drops the first and last
    // calendar days (`matrix_embedding.py:47-54`)
    val grained = TimeAxis.withDaySlot(std, "ts", 300L)
    val allDays = grained.select(col("day").cast("string")).distinct()
      .collect().map(_.getString(0)).sorted
    val fullDays = allDays.slice(1, allDays.length - 1)
    assert(fullDays.length == 191, s"${fullDays.length} full days, expected 191")
    val dayIdx = fullDays.zipWithIndex.toMap

    val ours = grained
      .filter(col("day").cast("string").isin(fullDays: _*))
      .select(col("day").cast("string"), col("slot"), col("power"))
      .collect()

    val src = scala.io.Source.fromFile(s"$fixtures/power_mat.csv")
    val mat = try src.getLines().map(_.split(",").map { s =>
      val t = s.trim; if (t.isEmpty || t == "nan") Double.NaN else t.toDouble
    }.toArray).toArray finally src.close()
    assert(mat.length == 288 && mat.head.length == 191)

    var bad = 0
    ours.foreach { r =>
      val d = dayIdx(r.getString(0))
      val s = r.getInt(1)
      val exp = mat(s)(d)
      val got = if (r.isNullAt(2)) Double.NaN else r.getDouble(2)
      val ok = (exp.isNaN && got.isNaN) || math.abs(exp - got) <= 1e-6
      if (!ok) bad += 1
    }
    assert(bad == 0, s"$bad cells diverge from power_mat")
  }
}
