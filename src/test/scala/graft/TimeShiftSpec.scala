package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.analyses.TimeShift
import graft.sources.Synth

/** Time-shift detection on a fleet with an injected 2-hour clock
  * shift halfway through (the reference's canonical scenario).
  */
class TimeShiftSpec extends AnyFunSuite {
  lazy val spark: SparkSession = GraftSession.local("8")
  import spark.implicits._

  test("detects the injected 2h shift and the roll correction re-centers solar noon") {
    val slotsPerDay = 48
    val fleet = Synth.pvFleet(spark, nSites = 1, nDays = 120, slotsPerDay = slotsPerDay)
    // inject: from day 60, clocks read 2 hours late (shift ts by +2h)
    val shifted = fleet.withColumn(
      "ts",
      when(col("day") >= 60, col("ts") + expr("INTERVAL 2 HOURS")).otherwise(col("ts"))
    )
    val shifts = TimeShift.detect(spark, shifted, "site", "ts", "power", slotsPerDay).cache()
    val lateDays = shifts.filter(col("day") >= "2024-03-01").agg(avg("roll_slots")).as[Double].head()
    val earlyDays = shifts.filter(col("day") < "2024-03-01").agg(avg("roll_slots")).as[Double].head()
    // 2h = 4 slots at 48/day; pwc splits the step around the median
    assert(math.abs((lateDays - earlyDays) - 4.0) < 1.0, s"late $lateDays early $earlyDays")

    // after correction, per-day energy CoM in corrected-slot space is
    // near-constant across the boundary
    val corrected = TimeShift.correct(shifted, shifts, "site", "ts", slotsPerDay)
      .groupBy(col("day"))
      .agg(try_divide(sum(col("slot_corrected") * col("power")), sum(col("power"))).as("com_slot"))
      .filter(col("com_slot").isNotNull)
    val comLate = corrected.filter(col("day") >= "2024-03-01").agg(avg("com_slot")).as[Double].head()
    val comEarly = corrected.filter(col("day") < "2024-03-01").agg(avg("com_slot")).as[Double].head()
    assert(math.abs(comLate - comEarly) < 1.0, s"com late $comLate early $comEarly")
  }

  test("sumCard detect yields exactly-flat shift plateaus (reference QSS re-solve)") {
    val slotsPerDay = 48
    val fleet = Synth.pvFleet(spark, nSites = 1, nDays = 120, slotsPerDay = slotsPerDay)
    val shifted = fleet.withColumn(
      "ts",
      when(col("day") >= 60, col("ts") + expr("INTERVAL 2 HOURS")).otherwise(col("ts"))
    )
    val shifts = TimeShift
      .detect(spark, shifted, "site", "ts", "power", slotsPerDay, sumCard = true)
      .cache()
    // the cardinality penalty flattens the shift series to a handful of
    // exactly-constant segments (the detected breakpoint may sit a day
    // or two off the injected one); the convex TV path wiggles instead
    val nLevelsCard = shifts.agg(countDistinct(round(col("shift_h"), 6))).as[Long].head()
    assert(nLevelsCard <= 4, s"sumCard shift series has $nLevelsCard distinct levels")
    val nLevelsCvx = TimeShift
      .detect(spark, shifted, "site", "ts", "power", slotsPerDay)
      .agg(countDistinct(round(col("shift_h"), 6))).as[Long].head()
    assert(nLevelsCvx > nLevelsCard,
      s"convex path ($nLevelsCvx levels) should wiggle more than sumCard ($nLevelsCard)")
    val lateDays = shifts.filter(col("day") >= "2024-03-01").agg(avg("roll_slots")).as[Double].head()
    val earlyDays = shifts.filter(col("day") < "2024-03-01").agg(avg("roll_slots")).as[Double].head()
    assert(math.abs((lateDays - earlyDays) - 4.0) < 1.0, s"late $lateDays early $earlyDays")
  }
}
