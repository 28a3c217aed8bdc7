package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Session factory mirroring the reference's runtime configuration —
  * AQE + coalescePartitions + Kryo (reference `spark-defaults.conf:16-18`,
  * `comprehensive_analytics_pipeline.py:100-102`) — standardized on UTC
  * (SURVEY §7 hard part 5).
  *
  * Scale posture: shuffle partitions default to the local core count, not
  * 200; on a real cluster this would be sized to ~2-3× total cores with AQE
  * coalescing the tail. All other knobs (broadcast threshold, skew-join) are
  * left to AQE, which re-plans from runtime statistics.
  */
object GraftSession {
  def builder(master: String = "local[*]", shufflePartitions: Int = 32): SparkSession.Builder =
    SparkSession
      .builder()
      .master(master)
      .appName("graft")
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.serializer", "org.apache.spark.serializer.KryoSerializer")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.warehouse.dir",
        sys.env.getOrElse("GRAFT_WAREHOUSE", "/tmp/graft-warehouse"))

  /** Session for tests: small core count, derby metastore in a temp dir. */
  def local(cores: Int = 4): SparkSession =
    builder(s"local[$cores]", shufflePartitions = cores).getOrCreate()
}

/** Parquet-backed star-schema tables (TESTDATA.md). Plain `spark.read
  * .parquet` relations so Catalyst's DataSource V1/V2 pushdown sees them
  * directly: filters and column pruning reach the parquet scan
  * (`PushedFilters` / `ReadSchema` in `.explain("formatted")`).
  */
final case class Tables(spark: SparkSession, dir: String) {
  private def t(name: String): DataFrame = spark.read.parquet(s"$dir/$name.parquet")
  def lineitem: DataFrame   = t("lineitem")
  def eventsRaw: DataFrame  = {
    // events.ts is parquet TIMESTAMP(NANOS), which Spark's vectorized reader
    // rejects ([PARQUET_TYPE_ILLEGAL]); read the physical int64 nanos and
    // floor-divide to microseconds (same truncation DuckDB applies when
    // formatting ns timestamps at µs precision). NOTE: the legacy flag is
    // session-wide and deliberately left set — any later nanos-typed scan in
    // this session reads as long, which is this engine's contract for nanos.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    t("events")
  }
  def orders: DataFrame     = t("orders")
  def customer: DataFrame   = t("customer")
  def supplier: DataFrame   = t("supplier")
  def part: DataFrame       = t("part")
  def nation: DataFrame     = t("nation")
  def region: DataFrame     = t("region")
  def events: DataFrame =
    eventsRaw.withColumn("ts", org.apache.spark.sql.functions.expr("timestamp_micros(ts div 1000)"))
  def documents: DataFrame  = t("documents")
  def embeddings: DataFrame = t("embeddings")
}
