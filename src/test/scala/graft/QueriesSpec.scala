package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Smoke + shape tests for every SparkEntry query on sf0.001, and the
  * flagship entry. (Cross-engine value parity is checked by the
  * DuckDB oracle harness — `tools/check_oracle.py`.)
  */
class QueriesSpec extends AnyFunSuite {
  lazy val spark: SparkSession = GraftSession.local("8")
  val dir = "/root/testdata/sf0.001"

  test("entry returns a non-empty fleet report") {
    val df = SparkEntry.entry(spark)
    assert(df.count() > 0)
  }

  test("every query has an oracle or is explicitly rows-only") {
    // round-6: d29 and e09 moved OUT of this set — both now carry
    // property-gate oracles (exact-distinct + calibration bounds;
    // per-query serving invariants)
    val rowsOnly = Set("p01_fleet_pipeline", "p02_dilation", "p03_quantile_clearsky",
      "p04_pca_shade", "p05_pvpro_post",
      // DEFLATE is not reproducible in a SQL engine (DeflateSpec
      // carries the value contracts)
      "d20_compress_ratio",
      // per-subspace Lloyd's trainer (PqSpec carries rank/
      // reconstruction contracts); e19 adds the recall-floor gate
      "e10_pq_adc",
      // composed trained stages (coarse k-means + PQ); PqSpec pins
      // exhaustive-probe equivalence to the full ADC scan; e20 gates
      "e11_ivf_pq")
    val missing = SparkEntry.queries.keySet.diff(SparkEntry.oracleSql.keySet).diff(rowsOnly)
    assert(missing.isEmpty, s"queries without oracle: $missing")
    // the list must stay honest in the other direction too: a query
    // that GAINED an oracle (as d25/d26 did via the training-loop
    // replay) must be dropped from it
    val stale = rowsOnly.intersect(SparkEntry.oracleSql.keySet)
    assert(stale.isEmpty, s"rows-only entries that now have oracles: $stale")
  }

  SparkEntry.queries.foreach { case (name, fn) =>
    test(s"$name runs and returns rows on sf0.001") {
      val df = fn(spark, dir)
      assert(df.columns.nonEmpty)
      assert(df.count() > 0, s"$name returned no rows")
    }
  }
}
