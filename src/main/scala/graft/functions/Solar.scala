package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Solar-geometry scalar functions as pure column expressions (all
  * codegen'd built-ins — no UDFs).
  *
  * Formulas follow the public Cooper/Spencer equations used by the
  * reference (`pvsystemprofiler/utilities/declination_equation.py:4-32`,
  * hour angle `hour_angle_equation.py:9-26`, daylight hours
  * `latitude/hours_daylight.py:6-15`).
  */
object Solar {
  private val DegToRad = math.Pi / 180.0
  private val RadToDeg = 180.0 / math.Pi

  /** Cooper declination (degrees) from day-of-year. */
  def declinationDeg(doy: Column): Column =
    lit(23.45) * sin(lit(2.0 * math.Pi) * (doy + lit(284.0)) / lit(365.0))

  /** Spencer equation of time (minutes) from day-of-year. */
  def equationOfTimeMin(doy: Column): Column = {
    val b = lit(2.0 * math.Pi) * (doy - lit(1.0)) / lit(365.0)
    lit(229.18) * (lit(0.000075)
      + lit(0.001868) * cos(b) - lit(0.032077) * sin(b)
      - lit(0.014615) * cos(lit(2.0) * b) - lit(0.04089) * sin(lit(2.0) * b))
  }

  /** Hour angle (degrees) from fractional solar hour of day. */
  def hourAngleDeg(solarHour: Column): Column =
    lit(15.0) * (solarHour - lit(12.0))

  /** Daylight hours at `latDeg` for declination `declDeg`
    * (sunset-hour-angle formula).
    */
  def daylightHours(latDeg: Double, declDeg: Column): Column = {
    val x = -tan(lit(latDeg * DegToRad)) * tan(declDeg * lit(DegToRad))
    val clamped = greatest(lit(-1.0), least(lit(1.0), x))
    lit(2.0 / 15.0) * acos(clamped) * lit(RadToDeg)
  }
}
