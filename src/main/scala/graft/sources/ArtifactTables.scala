package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Build-once-per-session, serve-from-catalog-table index artifacts — the
  * shared discipline behind the persisted SA+LCP / repeat-inventory tables
  * (q237/q247), the bucketed next-token index (q244), the LSH candidate
  * index (q34 family) and the KN/MKN model tables (q248/q251): the
  * artifact lives ON DISK as a catalog table, the in-memory footprint is
  * bounded key STRINGS, and a long-lived JVM serving many corpora and
  * parameterizations pins no checkpoint blocks — the on-disk index IS the
  * cache. The first touch of an artifact in a session (re)builds its
  * table — guarding against a stale on-disk table from an earlier JVM
  * whose corpus may have changed — and every later read hits the table.
  *
  * Identity is double-checked (ADVICE r10): table names embed a 64-bit
  * truncated-SHA-256 [[tag]] of the full corpus-identity string (a 31-bit
  * `String.hashCode` tag can collide across two dirs touched in one
  * session and silently serve the first corpus's artifact to the second),
  * AND the identity itself is recorded in a `graft.artifact.source` table
  * property at build and re-verified on every serve — a collision or a
  * repointed dir rebuilds instead of serving the wrong corpus.
  *
  * Cross-JVM rebuilds of a SHARED warehouse are serialized only within
  * one JVM (`guard.intern.synchronized`) — two concurrent JVMs racing the
  * same catalog table need an external lock, the standard single-writer
  * contract of a production table rebuild job.
  *
  * Reference anchor: the reference rebuilds its serving aggregates as
  * tables on a schedule and every query reads the table, never the raw
  * facts (airflow/dags/spark_jobs/comprehensive_analytics.py); this is
  * that economics applied to the engine's own index artifacts. */
object ArtifactTables {

  private val PropKey = "graft.artifact.source"

  /** Session-scoped first-touch guard; holds only key strings. */
  private val built =
    java.util.concurrent.ConcurrentHashMap.newKeySet[String]()

  /** 64-bit collision-resistant artifact tag: 16 hex chars of
    * SHA-256 over the NUL-joined identity parts. */
  def tag(parts: String*): String = {
    val md = java.security.MessageDigest.getInstance("SHA-256")
    md.digest(parts.mkString("\u0000").getBytes("UTF-8"))
      .take(8).map(b => f"$b%02x").mkString
  }

  private def sourceProp(spark: SparkSession, table: String): Option[String] =
    scala.util.Try(
      spark.sql(s"SHOW TBLPROPERTIES $table ('$PropKey')")
        .collect().headOption.map(_.getString(1))
        .filterNot(_.contains("does not have property"))
    ).toOption.flatten

  /** Run `build` once per (session, guard) — or whenever any of `tables`
    * is absent or carries a different recorded source identity — then
    * stamp every table with the identity property. `build` writes the
    * tables itself (multi-table artifacts write derived tables from
    * reading back earlier ones, so the base data is scanned once). A
    * failed build leaves no stamped tables: the next call re-enters. */
  def ensure(spark: SparkSession, guard: String, tables: Seq[String],
             source: String)(build: => Unit): Unit =
    guard.intern.synchronized {
      val key = s"${System.identityHashCode(spark.sessionState)}:$guard"
      lazy val stale = !tables.forall(tb => spark.catalog.tableExists(tb) &&
        sourceProp(spark, tb).contains(source))
      if (built.add(key) || stale) {
        tables.foreach(tb => TableIO.dropTableAndLocation(spark, tb))
        build
        val quoted = source.replace("'", "\\'")
        tables.foreach(tb => spark.sql(
          s"ALTER TABLE $tb SET TBLPROPERTIES ('$PropKey' = '$quoted')"))
      }
    }

  /** Single-table form: (re)build `name` from `body` on the session's
    * first touch (or staleness) and return `spark.table(name)`. */
  def artifactTable(spark: SparkSession, name: String, source: String)
                   (body: => DataFrame): DataFrame = {
    ensure(spark, name, Seq(name), source) {
      body.write.format("parquet").option("compression", "zstd")
        .saveAsTable(name)
    }
    spark.table(name)
  }
}
