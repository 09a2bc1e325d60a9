package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.analyses.{FleetEstimation, Study}
import graft.sources.Synth

/** Contract tests for the fleet batch-estimation face (the
  * reference's `pvsystemprofiler/scripts` glue re-expressed as one
  * plan per mode): resume anti-join, broadcast ground-truth join,
  * per-site additive gmt, residual sign, and the failsafe
  * placeholder row.
  */
class FleetEstimationSpec extends AnyFunSuite {
  lazy val spark: SparkSession = GraftSession.local("8")

  private def fleet = Synth.pvFleet(spark, nSites = 3, nDays = 90, slotsPerDay = 48)

  test("longitude mode: per-site gmt offset is bit-exactly the single-offset study") {
    import spark.implicits._
    // metadata assigns DIFFERENT offsets per site; the fleet face must
    // equal the per-site single-offset study runs (the additive-gmt
    // claim: location estimators commute with a constant shift)
    val meta = Seq((0L, -8.0), (1L, -5.0), (2L, 0.0)).toDF("site", "gmt_offset")
    val got = FleetEstimation.longitude(spark, fleet, "site", "ts", "power",
      metadata = Some(meta), includeFilled = false)
    assert(got.columns.contains("passes_estimation"))
    for ((siteId, g) <- Seq((0L, -8.0), (1L, -5.0), (2L, 0.0))) {
      def key(df: org.apache.spark.sql.DataFrame) = df
        .select(col("data_matrix"), col("solar_noon_method"), col("eot_calculation"),
          col("day_selection"), col("estimator"), col("longitude"))
        .collect().map(r => (r.getString(0), r.getString(1), r.getString(2),
          r.getString(3), r.getString(4)) -> Option(r.getAs[java.lang.Double](5))).toMap
      val single = key(Study.longitudeStudy(spark, fleet.filter(col("site") === siteId),
        "site", "ts", "power", gmtOffsetHours = g, includeFilled = false))
      val fleetRows = key(got.filter(col("site") === siteId))
      assert(fleetRows.keySet == single.keySet, s"site $siteId config labels")
      // the post-hoc shift is exact at the estimator level (location
      // estimates commute with a constant); vs the in-loop gmt form it
      // can differ only by the study's own 6-dp per-day rounding grain
      for ((k, s) <- single) (s, fleetRows(k)) match {
        case (None, None) =>
        case (Some(a), Some(b)) =>
          assert(math.abs(a - b) <= 2e-6, s"site $siteId $k: $a vs $b at gmt $g")
        case other => fail(s"site $siteId $k null mismatch: $other")
      }
    }
  }

  test("longitude residual sign matches the reference: true - estimate") {
    import spark.implicits._
    val meta = Seq((0L, 0.0, -120.0), (1L, 0.0, -100.0), (2L, 0.0, -80.0))
      .toDF("site", "gmt_offset", "longitude")
    val got = FleetEstimation.longitude(spark, fleet, "site", "ts", "power",
      metadata = Some(meta), includeFilled = false)
      .filter(col("longitude").isNotNull)
      .select(col("real_longitude"), col("longitude"), col("residual"))
      .collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      assert(math.abs(r.getDouble(2) - (r.getDouble(0) - r.getDouble(1))) < 1e-12)
    }
  }

  test("resume drops checked sites; estimation-less site gets the failsafe placeholder row") {
    import spark.implicits._
    // site 7 exists only as null-power rows: it is IN scope (the site
    // list sees it) but no study row can form -> the reference's NaN
    // placeholder with passes_estimation = false
    val ghost = Seq.tabulate(4)(i =>
      (7L, java.sql.Timestamp.valueOf(f"2024-01-0${i + 1}%d 12:00:00"),
        null.asInstanceOf[java.lang.Double]))
      .toDF("site", "ts", "power")
    val in = fleet.select(col("site"), col("ts"), col("power")).unionByName(ghost)
    val prev = Seq(Tuple1(0L)).toDF("site") // site 0 already checked
    val got = FleetEstimation.latitude(spark, in, "site", "ts", "power",
      resumeFrom = Some(prev), includeFilled = false)
    val bySite = got.groupBy(col("site"))
      .agg(max(col("passes_estimation").cast("int")).as("p"), count(lit(1)).as("n"))
      .collect().map(r => r.getLong(0) -> (r.getInt(1), r.getLong(2))).toMap
    assert(!bySite.contains(0L), "checked site must be skipped")
    assert(bySite(1L)._1 == 1 && bySite(2L)._1 == 1)
    assert(bySite(7L) == ((0, 1L)), s"ghost site row: ${bySite.get(7L)}")
    // placeholder estimates are null
    val ghostRow = got.filter(col("site") === 7L).collect()(0)
    assert(ghostRow.isNullAt(ghostRow.fieldIndex("latitude")))
  }

  test("report mode: pipeline row per site with sampling and truth columns joined") {
    import spark.implicits._
    val meta = Seq((0L, 37.5, -120.0), (1L, 38.0, -100.0), (2L, 36.0, -80.0))
      .toDF("site", "latitude", "longitude")
    val got = FleetEstimation.report(spark, fleet, "site", "ts", "power",
      metadata = Some(meta)).collect().sortBy(_.getLong(0))
    assert(got.length == 3)
    got.foreach { r =>
      assert(r.getBoolean(r.fieldIndex("passes_pipeline")))
      assert(r.getInt(r.fieldIndex("length")) == 90)
      // 48 slots/day = 30-minute sampling
      assert(r.getDouble(r.fieldIndex("data_sampling")) == 30.0)
      assert(r.getDouble(r.fieldIndex("capacity_estimate")) > 0.0)
      assert(!r.isNullAt(r.fieldIndex("real_latitude")))
      assert(!r.isNullAt(r.fieldIndex("real_longitude")))
    }
  }

  test("tilt/azimuth mode: metadata latitude feeds latOverride and residuals are true - estimate") {
    import spark.implicits._
    val meta = Seq((0L, 37.5, 20.0, 180.0), (1L, 38.0, 25.0, 170.0), (2L, 36.0, 15.0, 190.0))
      .toDF("site", "latitude", "tilt", "azimuth")
    val got = FleetEstimation.tiltAzimuth(spark, fleet, "site", "ts", "power",
      metadata = Some(meta))
      .filter(col("tilt_deg").isNotNull && col("day_range") === "full_year")
    val rows = got.collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      // latOverride plumb: the study's lat_est IS the metadata latitude
      assert(r.getDouble(r.fieldIndex("lat_est")) == r.getDouble(r.fieldIndex("real_latitude")))
      assert(math.abs(r.getDouble(r.fieldIndex("tilt_residual")) -
        (r.getDouble(r.fieldIndex("real_tilt")) - r.getDouble(r.fieldIndex("tilt_deg")))) < 1e-12)
      assert(math.abs(r.getDouble(r.fieldIndex("azimuth_residual")) -
        (r.getDouble(r.fieldIndex("real_azimuth")) -
          r.getDouble(r.fieldIndex("azimuth_duffie_deg")))) < 1e-12)
    }
  }

  test("longitude mode: sites absent from the metadata dim fall back to gmtOffsetDefault") {
    import spark.implicits._
    // only site 0 is in the dim (at -3); site 2 is absent and must
    // ride gmtOffsetDefault = -7 — i.e. match its own single-site
    // study run at that offset (the script's single command-line
    // gmt_offset for systems missing from the summary file)
    val meta = Seq((0L, -3.0)).toDF("site", "gmt_offset")
    val got = FleetEstimation.longitude(spark, fleet, "site", "ts", "power",
      metadata = Some(meta), gmtOffsetDefault = -7.0, includeFilled = false)
    def key(df: org.apache.spark.sql.DataFrame) = df
      .filter(col("longitude").isNotNull)
      .select(col("data_matrix"), col("solar_noon_method"), col("eot_calculation"),
        col("day_selection"), col("estimator"), col("longitude"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2),
        r.getString(3), r.getString(4)) -> r.getDouble(5)).toMap
    val single = key(Study.longitudeStudy(spark, fleet.filter(col("site") === 2L),
      "site", "ts", "power", gmtOffsetHours = -7.0, includeFilled = false))
    val fleetRows = key(got.filter(col("site") === 2L))
    assert(single.nonEmpty && fleetRows.keySet == single.keySet)
    for ((k, a) <- single)
      assert(math.abs(a - fleetRows(k)) <= 2e-6, s"$k: $a vs ${fleetRows(k)}")
  }
}
