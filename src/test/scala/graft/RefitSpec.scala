package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.analyses.Refit
import graft.sources.Synth

/** Incremental re-fit contracts: dirty detection is exact, a refresh
  * equals the full rebuild, clean sites keep their rows verbatim, and
  * an unchanged fleet is a no-op.
  */
class RefitSpec extends AnyFunSuite {
  lazy val spark: SparkSession = GraftSession.local("4")

  private def fleet(nDays: Int) =
    Synth.pvFleet(spark, nSites = 4, nDays = nDays, slotsPerDay = 96)
      .select(col("site"), col("ts"), col("power"))

  test("dirty detection, merge correctness, and no-op idempotence") {
    val full = fleet(90)
    // "yesterday's" ingest state: sites 0 and 2 are missing their last
    // 30 days; sites 1 and 3 are complete
    val cutoff = full.agg(max(to_date(col("ts")))).collect()(0).getDate(0)
    val stale = full.filter(
      !(col("site").isin(0L, 2L)) ||
        to_date(col("ts")) <= date_sub(lit(cutoff), 30))
    val prev = Refit.buildReport(spark, stale, "site", "ts", "power")

    val dirty = Refit.dirtySites(full, prev, "site", "ts", "power")
      .collect().map(_.getLong(0)).sorted
    assert(dirty.toSeq == Seq(0L, 2L), s"dirty sites: ${dirty.toSeq}")

    val merged = Refit.incremental(spark, full, prev, "site", "ts", "power")
    val rebuilt = Refit.buildReport(spark, full, "site", "ts", "power")
    // the merged report equals the full rebuild row-for-row (solver
    // kernels are deterministic, so equality is exact, not approximate)
    val m = merged.orderBy("site").collect().map(_.toSeq)
    val r = rebuilt.orderBy("site").collect().map(_.toSeq)
    assert(m.length == 4 && m.sameElements(r) || m.toSeq == r.toSeq,
      s"merged != rebuilt\n${m.toSeq}\n${r.toSeq}")
    // clean sites kept verbatim from prev
    val prevRows = prev.filter(col("site").isin(1L, 3L)).orderBy("site").collect().map(_.toSeq)
    val keptRows = merged.filter(col("site").isin(1L, 3L)).orderBy("site").collect().map(_.toSeq)
    assert(prevRows.toSeq == keptRows.toSeq, "clean sites' rows were rewritten")

    // idempotence: nothing dirty against the fresh report
    assert(Refit.dirtySites(full, rebuilt, "site", "ts", "power").count() == 0)
    val again = Refit.incremental(spark, full, rebuilt, "site", "ts", "power")
    assert(again.orderBy("site").collect().map(_.toSeq).toSeq == r.toSeq)
  }

  test("a same-day restatement (no new days) still marks the site dirty") {
    val full = fleet(30)
    val prev = Refit.buildReport(spark, full, "site", "ts", "power")
    // site 1 gets one value corrected — max(day) does not move
    val restated = full.withColumn("power",
      when(col("site") === 1L, col("power") * 1.01).otherwise(col("power")))
    val dirty = Refit.dirtySites(restated, prev, "site", "ts", "power")
      .collect().map(_.getLong(0))
    assert(dirty.toSeq == Seq(1L), s"dirty: ${dirty.toSeq}")
    val merged = Refit.incremental(spark, restated, prev, "site", "ts", "power")
    val rebuilt = Refit.buildReport(spark, restated, "site", "ts", "power")
    assert(merged.orderBy("site").collect().map(_.toSeq).toSeq
      == rebuilt.orderBy("site").collect().map(_.toSeq).toSeq)
  }

  test("a brand-new site is dirty by definition and appears in the refresh") {
    val five = Synth.pvFleet(spark, nSites = 5, nDays = 60, slotsPerDay = 96)
      .select(col("site"), col("ts"), col("power"))
    val four = five.filter(col("site") < 4)
    val prev = Refit.buildReport(spark, four, "site", "ts", "power")
    val dirty = Refit.dirtySites(five, prev, "site", "ts", "power").collect().map(_.getLong(0))
    assert(dirty.toSeq == Seq(4L), s"dirty: ${dirty.toSeq}")
    val merged = Refit.incremental(spark, five, prev, "site", "ts", "power")
    assert(merged.count() == 5)
    assert(merged.filter(col("site") === 4L).count() == 1)
  }

  test("a wholesale-deleted site is flagged dirty and drops from the refreshed report") {
    // the docstring's 'deletions' claim, exercised end to end: site 2
    // loses ALL its events; the full-outer dirty check must flag it
    // (a cur-side-only scan never would) and incremental() must drop
    // its stale row rather than carry it forever
    val full = fleet(30)
    val prev = Refit.buildReport(spark, full, "site", "ts", "power")
    val afterDelete = full.filter(col("site") =!= 2L)
    val dirty = Refit.dirtySites(afterDelete, prev, "site", "ts", "power")
      .collect().map(_.getLong(0))
    assert(dirty.toSeq == Seq(2L), s"dirty: ${dirty.toSeq}")
    val merged = Refit.incremental(spark, afterDelete, prev, "site", "ts", "power")
    assert(merged.count() == 3)
    assert(merged.filter(col("site") === 2L).count() == 0, "stale row for deleted site kept")
    // and the survivors kept their rows verbatim
    val prevRows = prev.filter(col("site") =!= 2L).orderBy("site").collect().map(_.toSeq)
    assert(merged.orderBy("site").collect().map(_.toSeq).toSeq == prevRows.toSeq)
  }
}
