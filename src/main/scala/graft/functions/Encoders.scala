package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** The reference's CASE-ladder encoders and impact factors, shared across
  * the analytics/ML builders (it imports pyspark.ml encoders but never uses
  * them — encoding is CASE ladders, `ml_feature_engineering.py:179-186,
  * 376-382`; impact factors `comprehensive_analytics.py:297-306,408-414`).
  */
object Encoders {

  /** clear/cloudy/rain/snow/fog → 1..5 (`ml_feature_engineering.py:179-186`);
    * `elseValue` differs between the demand (0.0) and fare (1.0) builders. */
  def weatherConditionEncoded(c: Column, elseValue: Double): Column =
    when(c === "clear", 1.0)
      .when(c === "cloudy", 2.0)
      .when(c === "rain", 3.0)
      .when(c === "snow", 4.0)
      .when(c === "fog", 5.0)
      .otherwise(elseValue)

  /** Borough → 1..5 (`ml_feature_engineering.py:376-382`). */
  def boroughEncoded(c: Column): Column =
    when(c === "Manhattan", 1.0)
      .when(c === "Brooklyn", 2.0)
      .when(c === "Queens", 3.0)
      .when(c === "Bronx", 4.0)
      .when(c === "Staten Island", 5.0)
      .otherwise(0.0)

  /** airport=3 / neighborhood=1 / other=2 (`ml_feature_engineering.py:195-199`). */
  def zoneTypeEncoded(c: Column): Column =
    when(c === "airport", 3.0).when(c === "neighborhood", 1.0).otherwise(2.0)

  /** rain/snow 1.2, fog 1.1 else 1.0 (`comprehensive_analytics.py:297-306`). */
  def weatherImpactScore(condition: Column): Column =
    when(condition.isin("rain", "snow"), 1.2)
      .when(condition === "fog", 1.1)
      .otherwise(1.0)

  /** Demand-feature impact factor incl. temperature bands
    * (`comprehensive_analytics.py:408-414`). */
  def weatherImpactFactor(condition: Column, tempC: Column): Column =
    when(condition.isin("rain", "snow"), 1.3)
      .when(condition === "fog", 1.1)
      .when(tempC < 0, 1.2)
      .when(tempC > 30, 1.1)
      .otherwise(1.0)

  /** Sunday=1/Saturday=7 weekend flag (`ml_feature_engineering.py:223`). */
  def isWeekend(ts: Column): Column = dayofweek(ts).isin(1, 7)

  /** 7-9 / 17-19 rush-hour flag (`ml_feature_engineering.py:359-360`). */
  def isRushHour(ts: Column): Column =
    hour(ts).between(7, 9) || hour(ts).between(17, 19)

  /** Flat-earth zone distance in km:
    * SQRT(POW(Δlat,2)+POW(Δlon,2))*111 (`ml_feature_engineering.py:440-441`
    * — deliberately NOT haversine; behavior parity). */
  def flatEarthKm(lat1: Column, lon1: Column, lat2: Column, lon2: Column): Column =
    sqrt(pow(lat1 - lat2, 2) + pow(lon1 - lon2, 2)) * 111

  /** Deterministic stand-in for the serving layer's RANDOM() jitter
    * (`serving/database.py:121-127,178-184`): a seeded xxhash64 folded to
    * [0,1). Golden tests reproduce; callers pass distinct salts. */
  def pseudoRand(salt: String, cols: Column*): Column =
    pmod(xxhash64((lit(salt) +: cols): _*), lit(1000000L)).cast("double") / 1000000.0
}
