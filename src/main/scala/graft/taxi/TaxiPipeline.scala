package graft.taxi

import java.sql.Timestamp

import graft.sources.TableIO
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Plain-Scala orchestration replacing the reference's Airflow DAGs
  * (SURVEY §7 module 6): the incremental-watermark control table
  * (`nyc_taxi_iceberg_etl.py:46-82`) and the dependency-ordered job
  * sequence ingest → analytics → ML (the `ExternalTaskSensor` gating of
  * `comprehensive_analytics_pipeline.py:160-162` becomes call order).
  *
  * All state lives in catalog tables; no XCom, no process boundaries. Each
  * derived table is refreshed with `TableIO.refreshPartitions` — the atomic
  * dynamic-partition overwrite that replaces the reference's two-step
  * DELETE+append.
  */
object TaxiPipeline {

  /** The `etl_control` watermark table: one row per source. */
  object EtlControl {
    def ensure(spark: SparkSession, table: String): Unit = {
      if (!spark.catalog.tableExists(table)) {
        import spark.implicits._
        Seq.empty[(String, Timestamp, Timestamp)]
          .toDF("source", "watermark", "updated_at")
          .write.format("parquet").saveAsTable(table)
      }
    }

    def watermark(spark: SparkSession, table: String, source: String): Option[Timestamp] =
      spark.table(table)
        .filter(col("source") === source)
        .orderBy(col("updated_at").desc)
        .limit(1)
        .collect()
        .headOption
        .map(_.getAs[Timestamp]("watermark"))

    /** Append-only control log (latest row wins) — safe under retries. */
    def advance(spark: SparkSession, table: String, source: String,
                wm: Timestamp, at: Timestamp): Unit = {
      import spark.implicits._
      Seq((source, wm, at)).toDF("source", "watermark", "updated_at")
        .write.mode("append").insertInto(table)
    }
  }

  /** Rows WRITTEN by this cycle (not table totals): counts come from
    * `observe()` metrics attached to each write's plan, so reporting costs
    * zero extra jobs — the reference's post-write `SELECT count(*)` rescans
    * (4 full scans per cycle) are the thing SURVEY §7 hard part 6 says not
    * to copy. */
  final case class PipelineResult(
      tripsLoaded: Long,
      weatherLoaded: Long,
      zonesLoaded: Long,
      analyticsRows: Map[String, Long])

  /** Attach a row-count observation to `df`, run `write`, return the count
    * observed on the rows that flowed into the write. */
  private def observedWrite(name: String, df: DataFrame)(write: DataFrame => Unit): Long = {
    val obs = new org.apache.spark.sql.Observation(s"graft_${name}_${System.nanoTime()}")
    write(df.observe(obs, count(lit(1)).as("rows")))
    obs.get("rows").asInstanceOf[Long]
  }

  /** One full batch cycle over raw inputs: ingest the three sources into
    * partitioned lakehouse tables, then build + refresh the five derived
    * tables. `db` prefixes every table name so runs are isolated. */
  def runBatchCycle(
      spark: SparkSession,
      rawTrips: DataFrame,
      rawWeather: DataFrame,
      rawZones: DataFrame,
      now: Timestamp,
      loadDate: Timestamp,
      db: String): PipelineResult = {

    val control = s"${db}_etl_control"
    EtlControl.ensure(spark, control)

    // ── ingest (only rows past the stored watermark; first run = all) ──
    val prevWm = EtlControl.watermark(spark, control, "trips")
    val tripsClean0 = TaxiIngest.cleanTrips(rawTrips, loadDate)
    val tripsFiltered = prevWm match {
      case Some(wm) => tripsClean0.filter(col("pickup_datetime") > lit(wm))
      case None     => tripsClean0
    }
    val tripsTable = s"${db}_trips"
    // Exactly-once under crash-retry: append and watermark-advance are two
    // writes, and a crash between them leaves the batch in the table with a
    // stale control row. The retry re-selects the same rows, so they are
    // anti-joined (on a business-column row hash — load_date excluded, it
    // differs per attempt) against the destination rows ABOVE the stored
    // watermark: exactly the span a crashed cycle could have half-written,
    // partition-prunable and empty on the happy path. Never a full-table
    // dedup.
    // Name-sorted so the hash is layout-independent (the write path moves
    // partition columns last), and null-tagged per column — xxhash64 SKIPS
    // null inputs, so without the isnull flags two rows whose values sit in
    // different nullable columns would collide and the retry would drop a
    // genuinely new row (same pattern as Snapshots.diff).
    def businessHash(df: DataFrame): org.apache.spark.sql.Column =
      xxhash64(df.columns.filterNot(_ == "load_date").sorted
        .flatMap(c => Seq(col(c).isNull.cast("int").cast("string"),
          col(c).cast("string"))): _*)
    // Occurrence-numbered anti join, not a plain hash anti join: a batch
    // may legitimately contain identical rows, and a crashed append can
    // have committed only SOME copies. Numbering copies per hash on both
    // sides and anti-joining on (hash, copy#) appends exactly the missing
    // multiplicity instead of dropping every incoming copy.
    val tripsClean =
      if (spark.catalog.tableExists(tripsTable)) {
        val atRisk = prevWm match {
          case Some(wm) => spark.table(tripsTable).filter(col("pickup_datetime") > lit(wm))
          case None     => spark.table(tripsTable)
        }
        val copyNum = row_number().over(
          org.apache.spark.sql.expressions.Window
            .partitionBy(col("_h")).orderBy(lit(1)))
        tripsFiltered
          .withColumn("_h", businessHash(tripsFiltered))
          .withColumn("_copy", copyNum)
          .join(
            atRisk
              .withColumn("_h", businessHash(atRisk))
              .withColumn("_copy", copyNum)
              .select(col("_h"), col("_copy")),
            Seq("_h", "_copy"), "left_anti")
          .drop("_h", "_copy")
      } else tripsFiltered
    TableIO.ensureTable(spark, tripsTable, tripsClean, Seq("year", "month"))
    // one pass: the write's plan also observes the batch row count AND the
    // new watermark — no separate agg job over the incoming batch
    val tripsObs = new org.apache.spark.sql.Observation(s"graft_trips_${System.nanoTime()}")
    TableIO.append(spark, tripsTable,
      tripsClean.observe(tripsObs,
        count(lit(1)).as("rows"), max(col("pickup_datetime")).as("wm")))
    val tripsLoaded = tripsObs.get("rows").asInstanceOf[Long]
    val maxTs = tripsObs.get("wm").asInstanceOf[Timestamp]
    // Advance from the appended batch; when the retry appended NOTHING
    // because a crashed cycle already landed the rows, converge the control
    // log from the destination's at-risk span instead (1-row pruned agg,
    // only on that rare path) — otherwise the watermark would stay stale
    // and every future cycle would re-scan the same span.
    val advanceTo =
      if (maxTs != null) Some(maxTs)
      else {
        val span = prevWm match {
          case Some(wm) => spark.table(tripsTable).filter(col("pickup_datetime") > lit(wm))
          case None     => spark.table(tripsTable)
        }
        Option(span.agg(max(col("pickup_datetime"))).collect()(0).getTimestamp(0))
      }
    advanceTo.foreach(wm => EtlControl.advance(spark, control, "trips", wm, loadDate))

    val weatherClean = TaxiIngest.cleanWeather(rawWeather, loadDate)
    val weatherTable = s"${db}_hourly_weather"
    TableIO.ensureTable(spark, weatherTable, weatherClean, Seq("year", "month", "day"))
    val weatherLoaded = observedWrite("weather", weatherClean)(
      TableIO.refreshPartitions(spark, weatherTable, _))

    val zonesClean = TaxiIngest.cleanZones(rawZones, loadDate)
    val zonesTable = s"${db}_taxi_zones"
    val zonesLoaded = observedWrite("zones", zonesClean)(
      TableIO.truncateReload(spark, zonesTable, _))

    // ── derived tables (dependency order; zones/weather already loaded) ──
    val trips = spark.table(tripsTable)
    val weather = spark.table(weatherTable)
    val zones = spark.table(zonesTable)

    def refresh(name: String, df: DataFrame, partitionCols: Seq[String]): Long = {
      val table = s"${db}_$name"
      // partition columns must be last for insertInto-positional semantics
      val reordered = df.select(
        (df.columns.filterNot(partitionCols.contains) ++ partitionCols).map(col): _*)
      TableIO.ensureTable(spark, table, reordered, partitionCols)
      observedWrite(name, reordered)(TableIO.refreshPartitions(spark, table, _))
    }

    val analyticsRows = Map(
      "trip_weather_correlation" -> refresh(
        "trip_weather_correlation",
        TaxiAnalytics.tripWeatherCorrelation(trips, weather, now, loadDate),
        Seq("year", "month")),
      "zone_performance_metrics" -> refresh(
        "zone_performance_metrics",
        TaxiAnalytics.zonePerformanceMetrics(trips, weather, zones, now, loadDate),
        Seq("year", "month")),
      "demand_prediction_features" -> refresh(
        "demand_prediction_features",
        TaxiAnalytics.demandPredictionFeatures(trips, weather, zones, now, loadDate),
        Seq("year", "month")),
      "ml_demand_features" -> refresh(
        "ml_demand_features",
        TaxiAnalytics.mlDemandFeatures(trips, weather, zones, now, loadDate),
        Seq("feature_date")),
      "ml_fare_features" -> refresh(
        "ml_fare_features",
        TaxiAnalytics.mlFareFeatures(trips, weather, zones, now, loadDate),
        Seq("feature_date")))

    PipelineResult(tripsLoaded, weatherLoaded, zonesLoaded, analyticsRows)
  }
}
