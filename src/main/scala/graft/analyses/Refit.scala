package graft.analyses

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.operators.SideJoin

/** Incremental fleet re-analysis — the operational loop the reference
  * cannot express: `sdt_dask`'s runner re-fits EVERY site on every
  * invocation (`sdt_dask/dask_tool/runner.py` maps the full pipeline
  * over the full site list), which at fleet scale means paying the
  * solver CPU — the dominant cost — for thousands of sites whose data
  * did not change. Here the report carries its per-site `as_of`
  * watermark (max ingested day at build time), so a refresh:
  *
  *   1. [[dirtySites]] — one map-side-combined per-site `max(day)`
  *      aggregation over the event scan joined against the report's
  *      watermarks (both site-cardinality — tiny next to the scan);
  *   2. re-runs the pipeline ONLY for dirty/new sites (a broadcast
  *      semi-join trims the scan; clean sites' rows never reach the
  *      solver stage);
  *   3. merges: prior rows for clean sites kept verbatim (the solver
  *      kernels are deterministic and partition-independent, so a
  *      kept row equals what a re-run would produce — spec-asserted),
  *      refreshed rows for the rest.
  *
  * Solver CPU therefore scales with the CHANGED slice of the fleet,
  * not the fleet. The streaming day-finalization twin
  * (`EventStream.finalizedDayStats`) produces exactly the append-only
  * closed-day feed whose arrival makes a site dirty.
  *
  * The dirty-site id list broadcasts (site-cardinality; fleets are
  * ≤10⁶ sites — bytes, not gigabytes). If a deployment ever exceeds
  * the broadcast envelope, flip the semi-join to the bucketed
  * sort-merge via `spark.graft.sideJoin=shuffle` semantics — the same
  * escape hatch every side join in the engine shares.
  */
object Refit {

  /** The fleet report plus each site's `as_of` ingest watermark. */
  def buildReport(
      spark: SparkSession,
      events: DataFrame,
      siteCol: String,
      tsCol: String,
      valueCol: String
  ): DataFrame = {
    val rep = Pipeline.run(spark, events, siteCol, tsCol, valueCol).toDF()
    val asOf = events.groupBy(col(siteCol).as("site"))
      .agg(max(to_date(col(tsCol))).as("as_of"))
    SideJoin.back(rep, asOf, Seq("site"))
  }

  /** Sites whose ingested data advanced past the report's watermark,
    * plus sites the report has never seen. One aggregation over the
    * scan; everything after is site-cardinality.
    */
  def dirtySites(
      events: DataFrame,
      report: DataFrame,
      siteCol: String,
      tsCol: String
  ): DataFrame = {
    val cur = events.groupBy(col(siteCol).as("site"))
      .agg(max(to_date(col(tsCol))).as("cur_max"))
    cur.join(report.select(col("site"), col("as_of")), Seq("site"), "left")
      .filter(col("as_of").isNull || col("cur_max") > col("as_of"))
      .select(col("site"), col("cur_max"))
  }

  /** Refresh `prevReport` against the current `events`: re-fit dirty
    * sites only, keep clean sites' rows verbatim. Idempotent — a
    * second call with unchanged events finds nothing dirty and
    * returns the report unchanged (and runs no solver work: the
    * refreshed branch is an empty frame the solver stage never sees
    * rows for).
    */
  def incremental(
      spark: SparkSession,
      events: DataFrame,
      prevReport: DataFrame,
      siteCol: String,
      tsCol: String,
      valueCol: String
  ): DataFrame = {
    val dirty = dirtySites(events, prevReport, siteCol, tsCol)
      .select(col("site").as(siteCol))
    val dirtyEvents = events.join(broadcast(dirty), Seq(siteCol), "left_semi")
    val refreshed = buildReport(spark, dirtyEvents, siteCol, tsCol, valueCol)
    prevReport
      .join(broadcast(dirty.select(col(siteCol).as("site"))), Seq("site"), "left_anti")
      .unionByName(refreshed)
  }
}
