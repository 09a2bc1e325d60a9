package graft.sources

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Deterministic synthetic PV fleet generator (semantics of the
  * reference's `model_soiling.py:18-232` validation simulator):
  * seasonal clear-sky envelope × soiling sawtooth × linear
  * degradation + pseudo-noise, on a regular (site, day, slot) grid.
  *
  * Built from `spark.range` + scalar column expressions only — fully
  * codegen'd and scale-free (generate 10^12 rows by changing the
  * bounds; no driver-side data).
  */
object Synth {

  /** @param slotsPerDay measurements per day (e.g. 288 = 5-min)
    * @param capStep     site whose capacity halves mid-series (to
    *                    exercise capacity-change detection); -1 = none
    */
  def pvFleet(
      spark: SparkSession,
      nSites: Int,
      nDays: Int,
      slotsPerDay: Int,
      capStep: Int = -1
  ): DataFrame = {
    val total = nSites.toLong * nDays * slotsPerDay
    val base = spark.range(total)
    val ids = base
      .withColumn("site", (col("id") / (nDays.toLong * slotsPerDay)).cast("long"))
      .withColumn("day", ((col("id") / slotsPerDay) % nDays).cast("long"))
      .withColumn("slot", (col("id") % slotsPerDay).cast("int"))
    val h = col("slot").cast("double") * 24.0 / slotsPerDay
    val daylight = greatest(lit(0.0), sin(lit(math.Pi) * (h - 6.0) / 12.0))
    val seasonal = lit(1.0) + lit(0.25) * sin(lit(2.0 * math.Pi) * col("day") / 365.2425)
    val degradation = lit(1.0) - lit(0.00005) * col("day")
    val soiling = lit(1.0) - lit(0.1) * (pmod(col("day"), lit(30)).cast("double") / 30.0)
    val capacity = when(lit(capStep) >= 0 && col("site") === capStep && col("day") >= nDays / 2, 5.0)
      .otherwise(10.0)
    // deterministic pseudo-noise in [-0.05, 0.05]: sin-hash of the row id
    val noise = sin(col("id").cast("double") * 12.9898) * 0.05
    val power = capacity * daylight * seasonal * degradation * soiling * (lit(1.0) + noise)
    ids
      .withColumn("ts", timestamp_seconds(lit(1704067200L) + col("day") * 86400 + col("slot") * (86400 / slotsPerDay)))
      .withColumn("power", greatest(lit(0.0), power))
      .select(col("site"), col("ts"), col("day"), col("slot"), col("power"))
  }
}
