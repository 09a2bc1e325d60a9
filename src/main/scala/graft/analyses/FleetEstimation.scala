package graft.analyses

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.TimeAxis

/** Fleet batch estimation — the reference's ops-scripting layer
  * (`pvsystemprofiler/scripts/parameter_estimation_script.py`,
  * `scripts/modules/script_functions.py:397-620`) re-expressed
  * Spark-first.
  *
  * The reference drives a SERIAL per-site loop: enumerate site files,
  * subtract the already-checked sites of a previous results CSV
  * (`resume_run`/`get_checked_sites`, script_functions.py:119-146),
  * then per system run the failsafe pipeline
  * (`run_failsafe_pipeline`:397) and one of {report, longitude,
  * latitude, tilt_azimuth} estimations against per-system ground
  * truth from a metadata CSV (`load_system_metadata`:468), appending
  * rows to a results frame.
  *
  * Here each mode is ONE fleet-wide plan:
  *
  *  - **resume** is a broadcast left-anti join against the previous
  *    results table — the checked-site set is a result-table
  *    projection, never a driver loop;
  *  - **per-site ground truth / config** (gmt offset, real
  *    coordinates) is a broadcast join of the small metadata dim, not
  *    a per-site closure capture. The longitude study's gmt term is
  *    provably additive (`lon = (720 − 60·SN − EoT)/4 + 15·gmt`,
  *    fitting.py:5-22 — every estimator in the engine's closed-form
  *    axis is a location estimate, and location estimates commute
  *    with a per-site constant shift), so the fleet runs the study
  *    ONCE at gmt 0 and applies `15·gmt_offset(site)` post-hoc from
  *    the joined dim — no per-offset re-scan;
  *  - **failsafe** is structural, not exception-driven: the pipeline
  *    stages are per-site best-effort with an `errors` channel
  *    ([[Pipeline.analyzeSite]]), and estimation modes left-join the
  *    in-scope site list so a site the study produced nothing for
  *    still emits its row with `passes_estimation = false` — the
  *    reference's NaN placeholder row
  *    (`run_failsafe_lon_estimation`:514, the except branch).
  *
  * Residual sign matches the reference: `true − estimate`
  * (`longitude_study.py:218`, `latitude_study.py:194`).
  *
  * Metadata columns (all optional except `site`): `gmt_offset`,
  * `longitude`, `latitude`, `tilt`, `azimuth` — the
  * `load_system_metadata` names. Truth coordinates are republished as
  * `real_longitude`/`real_latitude`/`real_tilt`/`real_azimuth`
  * (the script's "real longitude" report columns) so they never
  * collide with estimate columns.
  *
  * 100 TB posture: the metadata and resume dims are site-grain
  * (broadcast); everything else rides the already-scale-audited
  * fleet operators ([[Pipeline.run]], [[Study]]) — no new shuffle
  * and no driver-side site loop anywhere in this file.
  */
object FleetEstimation {

  /** Resume support (`resume_run`/`get_checked_sites`,
    * script_functions.py:119-146): drop sites already present in a
    * previous results table. Site-grain dim → broadcast anti join.
    */
  def withoutChecked(
      df: DataFrame,
      site: String,
      resumeFrom: Option[DataFrame]
  ): DataFrame = resumeFrom match {
    case None => df
    case Some(prev) =>
      val checked = prev.select(col("site").cast(df.schema(site).dataType).as(site)).distinct()
      df.join(broadcast(checked), Seq(site), "left_anti")
  }

  /** Truth/config dim normalized for joining: site cast to the data's
    * site type, coordinate columns renamed to `real_*`.
    */
  private def normalizedMetadata(metadata: DataFrame, siteType: org.apache.spark.sql.types.DataType): DataFrame = {
    val renames = Map(
      "longitude" -> "real_longitude", "latitude" -> "real_latitude",
      "tilt" -> "real_tilt", "azimuth" -> "real_azimuth")
    val cols = metadata.columns.map {
      case "site" => col("site").cast(siteType).as("site")
      case c      => col(c).as(renames.getOrElse(c, c))
    }
    metadata.select(cols.toSeq: _*)
  }

  private def joinMeta(est: DataFrame, site: String, metadata: Option[DataFrame]): DataFrame =
    metadata match {
      case None => est
      case Some(m) =>
        val dim = normalizedMetadata(m, est.schema(site).dataType)
          .withColumnRenamed("site", site)
        est.join(broadcast(dim), Seq(site), "left")
    }

  /** Report mode (`evaluate_systems` with `estimation = "report"`,
    * parameter_estimation_script.py:39-190): per-site pipeline report
    * row — passes flag, length, capacity, sampling, quality/clearness
    * scores, clipping/time-shift/capacity-change indicators — plus
    * the ground-truth columns when a metadata table is given.
    *
    * `data_sampling` is the modal Δt in minutes
    * ([[TimeAxis.inferFrequency]], the q06 operator) computed in the
    * same plan — the reference reads it off the serial per-site
    * handler (`dh.data_sampling`).
    */
  def report(
      spark: SparkSession,
      df: DataFrame,
      site: String,
      tsCol: String,
      valueCol: String,
      metadata: Option[DataFrame] = None,
      resumeFrom: Option[DataFrame] = None
  ): DataFrame = {
    val in = withoutChecked(df, site, resumeFrom)
    val rep = Pipeline.run(spark, in, site, tsCol, valueCol).toDF()
      .withColumnRenamed("site", "__rep_site")
    val sampling = TimeAxis.inferFrequency(in, Seq(site), tsCol)
      .select(col(site).as("__freq_site"), (col("freq_s") / lit(60.0)).as("data_sampling"))
    val out = rep
      .join(sampling, col("__rep_site") === col("__freq_site"), "left")
      .select(
        col("__rep_site").as(site),
        (col("errors") === lit("")).as("passes_pipeline"),
        col("nDays").as("length"),
        col("capacity").as("capacity_estimate"),
        col("data_sampling"),
        col("qualityScore").as("data_quality_score"),
        col("clearFrac").as("data_clearness_score"),
        col("clipped").as("inverter_clipping"),
        (col("timeShiftDays") > lit(0)).as("time_shifts_corrected"),
        (col("capacityChanges") > lit(0)).as("capacity_changes"),
        (col("abnormalDays") === lit(0)).as("normal_quality_scores"),
        col("errors"))
    joinMeta(out, site, metadata)
  }

  /** In-scope site list after the resume filter — the left side of
    * the failsafe join every estimation mode uses.
    */
  private def siteList(in: DataFrame, site: String): DataFrame =
    in.select(col(site)).distinct()

  /** Study input: null measurements can never contribute to an
    * estimate, and a site made ONLY of them must surface as a
    * failsafe placeholder, not an executor fault — the engine's
    * structural equivalent of the reference's bare `except` around
    * each study (script_functions.py:522/548/581). The site list
    * keeps the unfiltered scope, so such a site still gets its row.
    */
  private def measured(in: DataFrame, valueCol: String): DataFrame =
    in.filter(col(valueCol).isNotNull)

  /** The reference's `passes_estimation` is per STUDY RUN (did the
    * site's study produce results), not per config row
    * (script_functions.py:514-539) — the structural analog is "the
    * site has at least one non-null estimate", a site-grain window
    * over the result set.
    */
  private def withPasses(
      sites: DataFrame,
      est: DataFrame,
      site: String,
      estimateCol: String
  ): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col(site))
    sites
      .join(est, Seq(site), "left")
      .withColumn("passes_estimation",
        max(col(estimateCol).isNotNull.cast("int")).over(w) === lit(1))
  }

  /** Longitude mode (`run_failsafe_lon_estimation`,
    * script_functions.py:514-539): the full [[Study.longitudeStudy]]
    * config sweep per site, gmt offset applied per site from the
    * metadata dim (additively — see the object doc), `residual =
    * real_longitude − longitude` when truth is present.
    *
    * @param gmtOffsetDefault used for sites absent from the metadata
    *   dim (the script's single `gmt_offset` command-line value)
    */
  def longitude(
      spark: SparkSession,
      df: DataFrame,
      site: String,
      tsCol: String,
      valueCol: String,
      metadata: Option[DataFrame] = None,
      resumeFrom: Option[DataFrame] = None,
      gmtOffsetDefault: Double = 0.0,
      includeFilled: Boolean = true,
      includeOptimized: Boolean = false,
      estimators: Seq[String] = Seq("calculated", "fit_l1", "fit_l2", "fit_huber")
  ): DataFrame = {
    val in = withoutChecked(df, site, resumeFrom)
    val est0 = Study.longitudeStudy(spark, measured(in, valueCol), site, tsCol, valueCol,
      gmtOffsetHours = 0.0, includeFilled = includeFilled,
      includeOptimized = includeOptimized, estimators = estimators)
    val withTruth = joinMeta(est0, site, metadata)
    val gmt =
      if (withTruth.columns.contains("gmt_offset"))
        coalesce(col("gmt_offset").cast("double"), lit(gmtOffsetDefault))
      else lit(gmtOffsetDefault)
    val shifted = withTruth
      .withColumn("longitude", col("longitude") + lit(15.0) * gmt)
      .withColumn("residual",
        if (withTruth.columns.contains("real_longitude"))
          col("real_longitude") - col("longitude")
        else lit(null).cast("double"))
    withPasses(siteList(in, site), shifted, site, "longitude")
  }

  /** Latitude mode (`run_failsafe_lat_estimation`,
    * script_functions.py:541-562): the full [[Study.latitudeStudy]]
    * sweep, `residual = real_latitude − latitude`.
    */
  def latitude(
      spark: SparkSession,
      df: DataFrame,
      site: String,
      tsCol: String,
      valueCol: String,
      metadata: Option[DataFrame] = None,
      resumeFrom: Option[DataFrame] = None,
      includeFilled: Boolean = true,
      includeOptimized: Boolean = false
  ): DataFrame = {
    val in = withoutChecked(df, site, resumeFrom)
    val est0 = Study.latitudeStudy(spark, measured(in, valueCol), site, tsCol, valueCol,
      includeFilled = includeFilled, includeOptimized = includeOptimized)
    val withTruth = joinMeta(est0, site, metadata)
    val shifted = withTruth
      .withColumn("residual",
        if (withTruth.columns.contains("real_latitude"))
          col("real_latitude") - col("latitude")
        else lit(null).cast("double"))
    withPasses(siteList(in, site), shifted, site, "latitude")
  }

  /** Tilt/azimuth mode (`run_failsafe_ta_estimation`,
    * script_functions.py:564-620): the full
    * [[Study.tiltAzimuthStudy]] sweep. Per-site latitude input
    * (`lat_input` — the script feeds the previously-estimated or
    * real latitude) comes from the metadata dim's `latitude` column
    * via the study's `latOverride` seam; residuals against
    * `real_latitude`/`real_tilt`/`real_azimuth` where present.
    */
  def tiltAzimuth(
      spark: SparkSession,
      df: DataFrame,
      site: String,
      tsCol: String,
      valueCol: String,
      metadata: Option[DataFrame] = None,
      resumeFrom: Option[DataFrame] = None,
      useFilled: Boolean = false
  ): DataFrame = {
    val in = withoutChecked(df, site, resumeFrom)
    val latOverride = metadata
      .filter(_.columns.contains("latitude"))
      .map(m => normalizedMetadata(m, in.schema(site).dataType)
        .select(col("site").as(site), col("real_latitude").as("lat_est")))
    val est0 = Study.tiltAzimuthStudy(spark, measured(in, valueCol), site, tsCol, valueCol,
      latOverride = latOverride, useFilled = useFilled)
    val withTruth = joinMeta(est0, site, metadata)
    def residual(real: String, estCol: String): Column =
      if (withTruth.columns.contains(real)) col(real) - col(estCol)
      else lit(null).cast("double")
    val shifted = withTruth
      .withColumn("latitude_residual", residual("real_latitude", "lat_est"))
      .withColumn("tilt_residual", residual("real_tilt", "tilt_deg"))
      .withColumn("azimuth_residual", residual("real_azimuth", "azimuth_duffie_deg"))
    withPasses(siteList(in, site), shifted, site, "tilt_deg")
  }
}
