package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Diagnostic: dump the filled study day-grain's full-precision
  * center-of-mass noon (hex-float) for named sites, for cross-engine
  * divergence forensics.
  *
  * Round-10 investigation: q65's fit_l2 means differed from DuckDB by
  * 1 micro / n_days on two sites. This probe localized the divergence
  * to `round(v, 6)` inside the CoM sums — Spark's BigDecimal rounds
  * the value's shortest DECIMAL repr while DuckDB rounds the binary
  * product `v·1e6`, and the filled grid's dyadic interpolated values
  * (e.g. 32.9084375) hit 7th-decimal halves where the two disagree.
  * Fix: exact integer micro sums via scale-0 product rounds (see
  * `Study.scaleParams` scaladoc). Usage:
  * `runMain graft.ProbeQ65 <sfDir> <outTsv> <site,site,...>`
  */
object ProbeQ65 {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.01"
    val outPath = if (args.length > 1) args(1) else "/tmp/q65_probe.tsv"
    val sites = (if (args.length > 2) args(2) else "84,94")
      .split(",").map(_.trim.toLong).toSeq
    val spark = SparkSession.builder()
      .appName("probe-q65").master("local[8]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val day = graft.analyses.Study.dayGrain(
      spark, graft.sources.Tables.events(spark, sfDir),
      "user_id", "ts", "value",
      includeFilled = true, filledSlotsPerDay = 48, includeRaw = false)
      .filter(col("site").isin(sites: _*))
      .select(col("site"), col("day"), col("doy"), col("noon_com"))
      .collect()
      .sortBy(r => (r.getLong(0), r.get(1).toString))
    val out = new java.io.PrintWriter(outPath)
    day.foreach { r =>
      val noon = if (r.isNullAt(3)) "NULL"
        else java.lang.Double.toHexString(r.getDouble(3))
      out.println(s"${r.getLong(0)}\t${r.get(1)}\t${r.getInt(2)}\t$noon")
    }
    out.close()
    println(s"[probe-q65] wrote ${day.length} rows to $outPath")
    spark.stop()
  }
}
