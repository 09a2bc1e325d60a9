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
    // per-query serving invariants). Round-7: e10/e11 moved out the
    // same way (per-query serving invariants; their raw trained
    // outputs stay under the e19/e20 recall floors, and the serving
    // arithmetic is hash-gated with deterministic state in e15/e22).
    // Round-7: p02 gained a full-operator oracle (the union-window
    // cumulative-interpolation replay) and left this set too.
    // Round-8: p01/p03/p04/p05 gained invariant gates (relational
    // columns + construction-true literals, the d29/e09 idiom) and
    // left as well. Round-9: d20 gained the codec-pin floor gate
    // (byte counts + ratio invariants + fixed-string deflate pins),
    // emptying the set — EVERY query now has an oracle.
    val rowsOnly = Set.empty[String]
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
