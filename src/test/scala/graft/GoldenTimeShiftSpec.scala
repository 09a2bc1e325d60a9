package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.analyses.TimeShift

/** Golden parity for time-shift detection on the reference's own
  * two-year fixture (`tests/fixtures/time_shifts/`): the matrix with
  * injected clock shifts vs the reference-corrected matrix. We derive
  * the golden per-day roll by circular cross-matching the two
  * matrices, then require our detector to agree on the large majority
  * of days (the reference's own test allows solver-level differences;
  * exact matrix equality is solver-specific).
  */
class GoldenTimeShiftSpec extends AnyFunSuite {
  lazy val spark: SparkSession = GraftSession.local("8")

  private def loadMatrix(name: String): Array[Array[Double]] = {
    val src = scala.io.Source.fromFile(s"/root/reference/tests/fixtures/time_shifts/$name")
    try src.getLines().map(_.split(",").filter(_.nonEmpty).map(_.toDouble)).toArray
    finally src.close()
  }

  test("detected per-day rolls agree with the reference's corrected fixture") {
    import spark.implicits._
    val shifted = loadMatrix("two_year_signal_with_shift.csv") // (96 slots, 730 days)
    val fixed = loadMatrix("two_year_signal_fixed.csv")
    val nSlots = shifted.length
    val nDays = shifted.head.length

    // golden roll per day: the circular shift that best maps the
    // shifted column onto the fixed column
    val goldenRoll = Array.tabulate(nDays) { d =>
      (-16 to 16).maxBy { s =>
        var dot = 0.0
        var k = 0
        while (k < nSlots) {
          dot += shifted(((k + s) % nSlots + nSlots) % nSlots)(d) * fixed(k)(d)
          k += 1
        }
        dot
      }
    }
    // the reference corrects to an ABSOLUTE solar-noon baseline, so a
    // constant offset can apply to every day; our detector reports
    // rolls RELATIVE to the site's median clock. Compare relative
    // rolls: subtract the modal golden roll.
    val base = goldenRoll.groupBy(identity).maxBy(_._2.length)._1
    val goldenRel = goldenRoll.map(_ - base)
    assert(goldenRel.count(_ != 0) > 50, "fixture should contain shifted days")

    // long (site, ts, value) frame: day d, slot k at 15-min cadence
    val epoch0 = 1420070400L // 2015-01-01 UTC
    val rows = for (d <- 0 until nDays; k <- 0 until nSlots)
      yield (0L, epoch0 + d * 86400L + k * 900L, shifted(k)(d))
    val df = rows.toDF("site", "e", "value").withColumn("ts", timestamp_seconds(col("e")))

    val detected = TimeShift.detect(spark, df, "site", "ts", "value", slotsPerDay = 96)
      .select(col("day"), col("roll_slots"))
      .collect()
      .map(r => r.getString(0) -> r.getInt(1))
      .toMap
    val dayStr = (d: Int) =>
      java.time.LocalDate.ofEpochDay(epoch0 / 86400 + d).toString

    def agreement(sign: Int): Double = {
      val pairs = (0 until nDays).flatMap { d =>
        detected.get(dayStr(d)).map(r => (goldenRel(d), sign * r))
      }
      pairs.count { case (g, r) => g == r }.toDouble / math.max(pairs.size, 1)
    }
    val best = math.max(agreement(1), agreement(-1))
    assert(best > 0.75, s"roll agreement $best")

    // and on the unshifted majority specifically, we stay quiet
    val quiet = (0 until nDays).filter(d => goldenRel(d) == 0)
    val quietOk = quiet.count(d => detected.getOrElse(dayStr(d), 0) == 0).toDouble / quiet.size
    assert(quietOk > 0.85, s"false-positive rate on unshifted days: ${1 - quietOk}")
  }
}
