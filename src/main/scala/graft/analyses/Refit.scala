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

  /** The fleet report plus each site's ingest watermark: the human-
    * readable `as_of` day AND a content signature `ingest_sig` =
    * (row count, commutative sum of xxhash64(ts, value)). The
    * signature is what dirty detection compares — it changes on ANY
    * mutation (appended days, same-day backfills, corrected values,
    * deletions), where a max-day watermark alone misses restatements
    * that do not advance the clock. Order-independent by
    * construction (sum over a hash), so it is stable across
    * partitionings; each term is masked to 32 bits so the long sum
    * cannot overflow under ANSI mode below ~2×10⁹ rows per site
    * (two centuries of 1-second telemetry).
    */
  def buildReport(
      spark: SparkSession,
      events: DataFrame,
      siteCol: String,
      tsCol: String,
      valueCol: String
  ): DataFrame = {
    val rep = Pipeline.run(spark, events, siteCol, tsCol, valueCol).toDF()
    val asOf = events.groupBy(col(siteCol).as("site"))
      .agg(max(to_date(col(tsCol))).as("as_of"),
        count(lit(1)).as("ingest_n"),
        sum(xxhash64(col(tsCol), col(valueCol)).bitwiseAND(lit(0xFFFFFFFFL))).as("ingest_sig"))
    SideJoin.back(rep, asOf, Seq("site"))
  }

  /** Sites whose ingested content differs from the report's signature
    * (appends, restatements, partial deletions), plus sites the
    * report has never seen AND report-only sites whose events were
    * deleted wholesale — the full outer join is what catches the
    * latter (a left join from current events would scan only sites
    * that still HAVE events, so a fully-deleted site would keep its
    * stale report row forever). One map-side-combined aggregation
    * over the scan; everything after is site-cardinality.
    */
  def dirtySites(
      events: DataFrame,
      report: DataFrame,
      siteCol: String,
      tsCol: String,
      valueCol: String
  ): DataFrame = {
    val cur = events.groupBy(col(siteCol).as("site"))
      .agg(count(lit(1)).as("cur_n"),
        sum(xxhash64(col(tsCol), col(valueCol)).bitwiseAND(lit(0xFFFFFFFFL))).as("cur_sig"))
    cur.join(report.select(col("site"), col("ingest_n"), col("ingest_sig")), Seq("site"), "full_outer")
      .filter(col("ingest_sig").isNull || col("cur_sig").isNull ||
        col("cur_n") =!= col("ingest_n") || col("cur_sig") =!= col("ingest_sig"))
      .select(col("site"))
  }

  /** Refresh `prevReport` against the current `events`: re-fit dirty
    * sites only, keep clean sites' rows verbatim. A site whose events
    * were deleted wholesale is dirty (see [[dirtySites]]) and simply
    * DROPS from the merged report — its prior row leaves through the
    * anti-join and the refresh finds no events to rebuild it from.
    * Idempotent — a second call with unchanged events finds nothing
    * dirty and returns the report unchanged (and runs no solver work:
    * the refreshed branch is an empty frame the solver stage never
    * sees rows for).
    *
    * The dirty-site frame is MATERIALIZED once (eager
    * localCheckpoint — site-cardinality, stays in executor storage)
    * and feeds both the semi-join and the anti-join: a single
    * consistent snapshot, so a live source cannot yield one dirty set
    * to the trim and another to the merge (a site could otherwise
    * vanish from both branches), and the events scan is not
    * re-aggregated per consumer. Round 11: this used to collect() the
    * sites through the driver — equivalent at 10⁴ sites but a driver
    * hop that a 10⁶-site fleet with a hot ingest day does not need;
    * the checkpointed frame broadcasts straight from the executors.
    *
    * Reliability trade (vs the driver-collected copy): localCheckpoint
    * stores the snapshot ONLY in executor block storage — lose an
    * executor holding a partition and the whole incremental job fails
    * and must restart, where the collected copy survived executor
    * churn. Acceptable on a stable service fleet (the job is
    * idempotent — rerun and it converges); on a PREEMPTIBLE fleet,
    * swap in reliable checkpointing (`spark.sparkContext
    * .setCheckpointDir` + `.checkpoint()`) or persist the
    * site-cardinality frame with replicated storage
    * (`MEMORY_AND_DISK_2`) — same single-snapshot semantics, survives
    * single-executor loss.
    */
  def incremental(
      spark: SparkSession,
      events: DataFrame,
      prevReport: DataFrame,
      siteCol: String,
      tsCol: String,
      valueCol: String
  ): DataFrame = {
    val dirtyDf = dirtySites(events, prevReport, siteCol, tsCol, valueCol)
      .localCheckpoint(true)
    val dirtyEvents = events.join(
      broadcast(dirtyDf.select(col("site").as(siteCol))), Seq(siteCol), "left_semi")
    val refreshed = buildReport(spark, dirtyEvents, siteCol, tsCol, valueCol)
    prevReport
      .join(broadcast(dirtyDf), Seq("site"), "left_anti")
      .unionByName(refreshed)
  }
}
