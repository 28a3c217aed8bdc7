package graft.sources

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Snapshot-versioned parquet tables: the reference keeps its lakehouse
  * tables in Iceberg, whose essential mechanism is immutable data files
  * plus an atomically-swapped metadata pointer — that mechanism, reduced
  * to plain parquet + HDFS-rename atomicity, with time travel, rollback,
  * and retention vacuum. (Reference tables:
  * `airflow/dags/spark_jobs/nyc_taxi_to_iceberg.py:41-70`; its operational docs lean on
  * Iceberg snapshots for recovery.)
  *
  * Layout under one base directory:
  * {{{
  *   <base>/v=1/…parquet      immutable snapshot data (never rewritten)
  *   <base>/v=2/…parquet
  *   <base>/_LATEST           one line: the current version number
  * }}}
  *
  * Commit protocol: data lands fully in its `v=N` directory FIRST, then
  * `_LATEST` is swapped by write-temp + atomic rename — readers resolve
  * the pointer once and only ever list a complete snapshot directory, so
  * a crashed writer leaves at worst an orphaned (never-referenced)
  * directory for [[vacuum]] to collect; it can never corrupt the current
  * view. Commits are O(1) metadata regardless of data size.
  *
  * Scale notes: rename-atomicity holds on HDFS-semantics filesystems; on
  * an eventually-consistent object store the pointer swap moves into any
  * conditional-put/metastore — the data layout is unchanged. A reader
  * that resolved version N keeps reading N's immutable files even as
  * writers commit N+1 (snapshot isolation); [[vacuum]] retention is the
  * standard bound on how long such readers may run.
  */
object Snapshots {

  private val Latest = "_LATEST"

  private def fs(spark: SparkSession, base: String): FileSystem =
    new Path(base).getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Versions present on disk (committed or orphaned), ascending. */
  def versions(spark: SparkSession, base: String): Seq[Long] = {
    val f = fs(spark, base)
    val dir = new Path(base)
    if (!f.exists(dir)) Seq.empty
    else
      f.listStatus(dir).toSeq
        .filter(s => s.isDirectory && s.getPath.getName.startsWith("v="))
        .map(_.getPath.getName.stripPrefix("v=").toLong)
        .sorted
  }

  /** The committed current version, if any write ever committed. */
  def currentVersion(spark: SparkSession, base: String): Option[Long] = {
    val f = fs(spark, base)
    val p = new Path(base, Latest)
    if (!f.exists(p)) None
    else {
      val in = f.open(p)
      try {
        val buf = new java.io.ByteArrayOutputStream()
        val tmp = new Array[Byte](256)
        var n = in.read(tmp)
        while (n > 0) { buf.write(tmp, 0, n); n = in.read(tmp) }
        Some(new String(buf.toByteArray, "UTF-8").trim.toLong)
      } finally in.close()
    }
  }

  private def swapPointer(spark: SparkSession, base: String, version: Long): Unit = {
    val f = fs(spark, base)
    val tmp = new Path(base, s".${Latest}.tmp")
    val out = f.create(tmp, true)
    try out.write(version.toString.getBytes("UTF-8"))
    finally out.close()
    val target = new Path(base, Latest)
    f.delete(target, false) // POSIX rename replaces; HDFS needs the delete
    if (!f.rename(tmp, target))
      throw new java.io.IOException(s"pointer swap failed for $base v=$version")
  }

  /** Commit `df` as the next snapshot and return its version number. */
  def write(df: DataFrame, base: String): Long = {
    val spark = df.sparkSession
    val next = versions(spark, base).lastOption.getOrElse(0L) + 1
    df.write.format("parquet").option("compression", "zstd")
      .save(s"$base/v=$next")
    swapPointer(spark, base, next) // publish only after the data is complete
    next
  }

  /** Read the current snapshot, or a specific version (time travel). */
  def read(spark: SparkSession, base: String, version: Option[Long] = None): DataFrame = {
    val v = version.orElse(currentVersion(spark, base)).getOrElse(
      throw new IllegalArgumentException(s"no committed snapshot at $base"))
    spark.read.parquet(s"$base/v=$v")
  }

  /** Point the table back at an older committed snapshot (O(1), data
    * untouched — the misbegotten newer snapshot stays readable by version
    * until vacuumed). */
  def rollback(spark: SparkSession, base: String, version: Long): Unit = {
    require(versions(spark, base).contains(version), s"unknown version $version")
    swapPointer(spark, base, version)
  }

  /** Delete snapshots older than the `keepLast` most recent, never the
    * current pointer target. Returns the versions removed. */
  def vacuum(spark: SparkSession, base: String, keepLast: Int): Seq[Long] = {
    val f = fs(spark, base)
    val all = versions(spark, base)
    val current = currentVersion(spark, base)
    val removable = all.dropRight(keepLast).filterNot(current.contains)
    removable.foreach(v => f.delete(new Path(base, s"v=$v"), true))
    removable
  }

  /** Change data feed between two committed versions: one row per key that
    * was inserted, deleted, or updated, carrying the key and
    * `_change_type` (Delta CDF's column name). The comparison is a single
    * full outer join on the key; update detection hashes the non-key
    * columns on each side (xxhash64 over all columns, null-tagged), so
    * wide rows compare in one 8-byte equality, not column-by-column — at
    * the cost of a 2^-64 per-row chance that a genuinely changed row
    * hash-collides and is classified unchanged. This is how a downstream
    * consumer syncs from a snapshot store without replaying writes:
    * diff(v_n, v_m) works regardless of how many intermediate versions
    * were vacuumed; consumers needing payloads join the keyed output back
    * to `read(base, toVersion)`. */
  def diff(spark: SparkSession, base: String, fromVersion: Long,
           toVersion: Long, key: String): DataFrame = {
    import org.apache.spark.sql.functions._
    val before = read(spark, base, Some(fromVersion))
    val after = read(spark, base, Some(toVersion))
    require(before.columns.sorted.sameElements(after.columns.sorted),
      "schema changed between versions; diff requires matching columns")
    val valueCols = before.columns.filter(_ != key).sorted
    // null-tagged row hash: (isnull flag, value) per column so NULL and
    // "null"-like encodings can't collide
    def rowHash(df: DataFrame) = xxhash64(
      valueCols.flatMap(c => Seq(col(c).isNull.cast("int"), col(c))).map(c => c.cast("string")): _*)
    val l = before.select(col(key).as("k"), rowHash(before).as("h_before"))
    val r = after.select(col(key).as("k"), rowHash(after).as("h_after"))
    l.join(r, Seq("k"), "full_outer")
      .select(col("k").as(key),
        when(col("h_before").isNull, lit("insert"))
          .when(col("h_after").isNull, lit("delete"))
          .when(col("h_before") =!= col("h_after"), lit("update_postimage"))
          .otherwise(lit("unchanged")).as("_change_type"))
      .filter(col("_change_type") =!= "unchanged")
      .orderBy(col(key))
  }

  /** q125: [[diff]] driven end-to-end through the snapshot store on a
    * deterministic fixture — two derived views of `orders` committed as
    * v1/v2, then CDF'd. Key-residue derivations make every change class
    * non-empty and DuckDB-replayable from the raw table (the oracle
    * re-derives both sides in SQL and classifies by direct value compare —
    * equivalent to the row-hash compare modulo xxhash collisions):
    * v1 = orders without keys ≡0 (mod 7); v2 = orders without keys ≡0
    * (mod 5), with totalprice bumped on keys ≡0 (mod 3). So ≡0 (mod 7)
    * keys surviving the mod-5 cut are inserts, ≡0 (mod 5) keys present in
    * v1 are deletes, and surviving ≡0 (mod 3) keys are updates. */
  def diffDemoOrders(t: graft.core.Tables): DataFrame = {
    import org.apache.spark.sql.functions._
    val base = java.nio.file.Files
      .createTempDirectory("graft-snapdiff").toString
    val slim = t.orders.select(
      col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
    val v1 = write(slim.filter(col("o_orderkey") % 7 =!= 0), base)
    val v2 = write(
      slim.filter(col("o_orderkey") % 5 =!= 0)
        .withColumn("o_totalprice",
          when(col("o_orderkey") % 3 === 0, col("o_totalprice") + 1)
            .otherwise(col("o_totalprice"))),
      base)
    diff(t.spark, base, v1, v2, "o_orderkey")
  }

  /** q171: [[read]]`(version)` + [[rollback]] driven end-to-end through the
    * snapshot store — two derived views of `orders` committed as v1/v2, the
    * pointer rolled back to v1, then BOTH views read: the current pointer
    * (which must resolve to v1 again, proving rollback is a pure pointer
    * move) and an explicit version-pinned read of v2 (proving the newer
    * snapshot stays readable after rollback — time travel FORWARD of the
    * pointer). Each side is summarized with order-independent exact
    * aggregates (counts, min/max, integer sum) so the whole mechanism sits
    * under the driver's hash gate. (Reference recovery workflow leans on
    * Iceberg snapshot rollback: `nyc_taxi_to_iceberg.py:57-70`.) */
  def timeTravelDemo(t: graft.core.Tables): DataFrame = {
    import org.apache.spark.sql.functions._
    val spark = t.spark
    val base = java.nio.file.Files
      .createTempDirectory("graft-snaptravel").toString
    val slim = t.orders.select(
      col("o_orderkey"), col("o_orderstatus"), col("o_custkey"))
    val v1 = write(slim.filter(col("o_orderkey") % 7 =!= 0), base)
    val v2 = write(slim.filter(col("o_orderkey") % 5 =!= 0), base)
    rollback(spark, base, v1)
    require(currentVersion(spark, base).contains(v1),
      s"rollback did not move the pointer to v=$v1")
    def summarize(df: DataFrame, tag: String): DataFrame =
      df.agg(
        count(lit(1)).as("n"),
        min(col("o_orderkey")).as("min_key"),
        max(col("o_orderkey")).as("max_key"),
        sum(col("o_orderkey")).as("sum_key"),
        countDistinct(col("o_orderstatus")).as("n_status"))
        .select(lit(tag).as("snapshot_view"), col("*"))
    summarize(read(spark, base), "current_after_rollback")
      .unionByName(summarize(read(spark, base, Some(v2)), "v2_time_travel"))
      .orderBy(col("snapshot_view"))
  }

  /** DuckDB mirror of [[timeTravelDemo]]: current-after-rollback replays as
    * the v1 derivation, the version-pinned read as the v2 derivation. */
  val timeTravelDemoSql: String =
    """SELECT 'current_after_rollback' AS snapshot_view, count(*) AS n,
      |  min(o_orderkey) AS min_key, max(o_orderkey) AS max_key,
      |  CAST(sum(o_orderkey) AS BIGINT) AS sum_key,
      |  count(DISTINCT o_orderstatus) AS n_status
      |FROM orders WHERE o_orderkey % 7 <> 0
      |UNION ALL
      |SELECT 'v2_time_travel', count(*),
      |  min(o_orderkey), max(o_orderkey),
      |  CAST(sum(o_orderkey) AS BIGINT),
      |  count(DISTINCT o_orderstatus)
      |FROM orders WHERE o_orderkey % 5 <> 0
      |ORDER BY snapshot_view""".stripMargin

  /** DuckDB mirror of [[diffDemoOrders]]. */
  val diffDemoOrdersSql: String =
    """WITH b AS (
      |  SELECT o_orderkey, o_custkey, o_totalprice
      |  FROM orders WHERE o_orderkey % 7 <> 0),
      |a AS (
      |  SELECT o_orderkey, o_custkey,
      |    CASE WHEN o_orderkey % 3 = 0 THEN o_totalprice + 1
      |         ELSE o_totalprice END AS o_totalprice
      |  FROM orders WHERE o_orderkey % 5 <> 0)
      |SELECT coalesce(b.o_orderkey, a.o_orderkey) AS o_orderkey,
      |  CASE WHEN b.o_orderkey IS NULL THEN 'insert'
      |       WHEN a.o_orderkey IS NULL THEN 'delete'
      |       ELSE 'update_postimage' END AS _change_type
      |FROM b FULL OUTER JOIN a ON b.o_orderkey = a.o_orderkey
      |WHERE b.o_orderkey IS NULL OR a.o_orderkey IS NULL
      |   OR b.o_totalprice <> a.o_totalprice
      |   OR b.o_custkey <> a.o_custkey
      |ORDER BY o_orderkey""".stripMargin
}
