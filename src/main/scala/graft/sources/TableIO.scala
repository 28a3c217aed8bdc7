package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}

/** Lakehouse write paths (SURVEY §2.1 S7–S10), bound to managed parquet
  * catalog tables since no Iceberg/Delta jars ship locally (SURVEY §7
  * "local constraints"). Semantics preserved:
  *
  *  - S7 append — `writeTo(t).append()` in the reference becomes
  *    `insertInto` (positional, mode append);
  *  - S8 delete-then-append refresh — the reference's two-transaction
  *    `DELETE FROM t WHERE window` + append becomes ONE atomic dynamic
  *    partition overwrite: only the partitions present in the incoming
  *    DataFrame are replaced. This is the 100 TB-correct form: idempotent
  *    re-runs, no torn state between delete and append, and the overwrite
  *    set is pruned to the refresh window's partitions;
  *  - S9 truncate-reload — full-dimension replace;
  *  - S10 CTAS — partitioned CREATE TABLE AS SELECT (replace via drop:
  *    plain Spark catalogs lack CREATE OR REPLACE TABLE).
  *
  * Storage posture mirrors the reference: parquet + zstd
  * (`nyc_taxi_to_iceberg.py:67-70`), explicit partition columns replacing
  * Iceberg's hidden transforms.
  */
object TableIO {

  /** Create the table (parquet+zstd, partitioned) if absent. Idempotent. */
  def ensureTable(
      spark: SparkSession,
      table: String,
      like: DataFrame,
      partitionCols: Seq[String]): Unit = {
    if (!spark.catalog.tableExists(table)) {
      val writer = like.limit(0).write
        .format("parquet")
        .option("compression", "zstd")
      (if (partitionCols.nonEmpty) writer.partitionBy(partitionCols: _*) else writer)
        .saveAsTable(table)
    }
  }

  /** Align `df`'s columns BY NAME with the table's schema. `insertInto`
    * resolves positionally, and `saveAsTable` moves partition columns to
    * the END of the stored schema — so a frame whose partition columns sit
    * mid-schema would silently land values in the wrong columns (year=10,
    * month=24 style corruption). Name alignment kills the whole class.
    *
    * Schema evolution (the reference writes with `merge-schema=true`,
    * `nyc_taxi_to_iceberg.py:142`): columns the table has but `df` lacks
    * are null-filled at the table's type; compatible type differences are
    * cast to the table side. Column ADDITION is handled by [[append]]
    * before alignment. */
  private def alignToTable(spark: SparkSession, table: String, df: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions.{col, lit}
    val dfCols = df.columns.map(c => c.toLowerCase -> c).toMap
    df.select(spark.table(table).schema.map { f =>
      dfCols.get(f.name.toLowerCase) match {
        case Some(c) => col(c).cast(f.dataType).as(f.name)
        case None    => lit(null).cast(f.dataType).as(f.name)
      }
    }.toIndexedSeq: _*)
  }

  /** Evolve the table's DDL for columns present in `df` but absent from the
    * table (`ALTER TABLE … ADD COLUMNS`) — parquet reads the new column as
    * NULL for pre-evolution files, which is exactly the Iceberg
    * merge-schema read semantics the reference relies on. (Type WIDENING of
    * an existing column is not supported by plain parquet catalog tables —
    * Iceberg-only; callers get a cast to the existing table type instead.) */
  private def evolveForNewColumns(spark: SparkSession, table: String, df: DataFrame): Unit = {
    val existing = spark.table(table).columns.map(_.toLowerCase).toSet
    val added = df.schema.filterNot(f => existing.contains(f.name.toLowerCase))
    if (added.nonEmpty) {
      val ddl = added.map(f => s"`${f.name}` ${f.dataType.sql}").mkString(", ")
      spark.sql(s"ALTER TABLE $table ADD COLUMNS ($ddl)")
    }
  }

  /** S7: append rows with merge-schema semantics (by-name alignment; new
    * `df` columns evolve the table DDL, columns missing from `df` are
    * null-filled) — like the reference's `writeTo(t).append()` with
    * `merge-schema=true`. */
  def append(spark: SparkSession, table: String, df: DataFrame): Unit = {
    evolveForNewColumns(spark, table, df)
    alignToTable(spark, table, df).write.mode("append").insertInto(table)
  }

  /** S8: atomic window refresh — dynamic partition overwrite replaces
    * exactly the partitions present in `df`, leaving the rest untouched. */
  def refreshPartitions(spark: SparkSession, table: String, df: DataFrame): Unit = {
    evolveForNewColumns(spark, table, df) // merge-schema on refresh too
    val key = "spark.sql.sources.partitionOverwriteMode"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key, "dynamic")
    try alignToTable(spark, table, df).write.mode("overwrite").insertInto(table)
    finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None    => spark.conf.unset(key)
    }
  }

  /** S9: full truncate + reload (dimension refresh,
    * `location_to_iceberg.py:90-95`). */
  def truncateReload(
      spark: SparkSession,
      table: String,
      df: DataFrame,
      partitionCols: Seq[String] = Nil): Unit = {
    dropTableAndLocation(spark, table)
    val writer = df.write.format("parquet").option("compression", "zstd")
    (if (partitionCols.nonEmpty) writer.partitionBy(partitionCols: _*) else writer)
      .saveAsTable(table)
  }

  /** Drop the table AND its warehouse location. A metastore is per-session
    * but the warehouse directory persists — after a process restart, `DROP
    * TABLE IF EXISTS` is a no-op in the fresh metastore while the old data
    * directory still exists on disk, and managed-table CTAS then fails with
    * LOCATION_ALREADY_EXISTS. Replace-style writers must clear both. */
  private[graft] def dropTableAndLocation(spark: SparkSession, table: String): Unit = {
    spark.sql(s"DROP TABLE IF EXISTS $table")
    val path = new org.apache.hadoop.fs.Path(
      spark.conf.get("spark.sql.warehouse.dir"), table.toLowerCase)
    val fs = path.getFileSystem(spark.sessionState.newHadoopConf())
    if (fs.exists(path)) fs.delete(path, true)
  }

  /** Collect table-level statistics after a write so the cost-based
    * optimizer sees row counts/sizes — at scale this is what makes broadcast
    * decisions and join reordering correct for catalog tables. */
  def analyze(spark: SparkSession, table: String): Unit =
    spark.sql(s"ANALYZE TABLE $table COMPUTE STATISTICS")

  /** Persist `df` bucketed (and optionally sorted) on the join/agg key.
    *
    * Bucketing is THE shuffle eliminator for repeated big-to-big joins: two
    * tables bucketed identically on the join key are read pre-partitioned,
    * so a SortMergeJoin between them plans with NO Exchange on either side
    * (asserted in PlanAuditSpec) — at 100 TB that converts every fact⋈fact
    * query from a full-data shuffle into a per-bucket zip. Aggregations on
    * the bucket key skip their Exchange the same way. The cost is paid once
    * at write: `nBuckets` output files per write task; pick nBuckets so one
    * bucket of the LARGER table fits an executor's memory. */
  def saveBucketed(
      spark: SparkSession,
      table: String,
      df: DataFrame,
      bucketCols: Seq[String],
      nBuckets: Int,
      sortCols: Seq[String] = Nil): Unit = {
    dropTableAndLocation(spark, table)
    val w = df.write.format("parquet").option("compression", "zstd")
      .bucketBy(nBuckets, bucketCols.head, bucketCols.tail: _*)
    (if (sortCols.nonEmpty) w.sortBy(sortCols.head, sortCols.tail: _*) else w)
      .saveAsTable(table)
  }

  /** Persist `df` range-CLUSTERED on `clusterCols`: `repartitionByRange`
    * gives each output file a disjoint key range and
    * `sortWithinPartitions` orders rows inside it, so every parquet file
    * (and row group) carries a tight, non-overlapping min/max footer
    * range on the cluster key. Readers filtering on that key skip whole
    * files from footer stats alone — the plain-parquet analog of
    * Iceberg's sort orders / one-dimensional Z-ordering. Complementary to
    * [[saveBucketed]]: bucketing kills join/agg shuffles on equality
    * keys; clustering kills scan I/O for range predicates (dates, ids).
    * `nFiles` sizes the range sampling AND the output file count — at
    * 100 TB pick it so files land near the row-group-friendly 128 MB-1 GB
    * band. Non-overlap is asserted value-level in TableIOSpec. */
  def saveClustered(
      spark: SparkSession,
      table: String,
      df: DataFrame,
      clusterCols: Seq[String],
      nFiles: Int): Unit = {
    import org.apache.spark.sql.functions.col
    dropTableAndLocation(spark, table)
    df.repartitionByRange(nFiles, clusterCols.map(col): _*)
      .sortWithinPartitions(clusterCols.map(col): _*)
      .write.format("parquet").option("compression", "zstd")
      .saveAsTable(table)
  }

  /** Persist `df` with parquet BLOOM FILTERS on the given columns — the
    * file-skipping lever for point lookups on HIGH-CARDINALITY keys,
    * where footer min/max stats (the [[saveClustered]]/[[saveZOrdered]]
    * mechanism) prune nothing because hash-scattered ids span the whole
    * domain in every file. The writer packs an SBBF (split block bloom
    * filter) per row group per column (~1.2 bytes/ndv at the default 1%
    * FPP); Spark's vectorized reader consults it for `key = x` predicates
    * automatically under `spark.sql.parquet.filterPushdown`, skipping row
    * groups that provably lack the key. Storage-side complement of the
    * query-side [[graft.operators.RuntimeFilter]] bloom semi-join: that
    * one prunes a join's probe side at runtime, this one prunes the scan
    * from the file footer before any row is read. `ndv` sizes the filter
    * (per row group, so pass the PER-FILE distinct estimate — at 100 TB,
    * from partition stats or a KMV sketch, not a guess). Footer presence
    * is asserted via the parquet metadata API in TableIOSpec.
    *
    * Dictionary encoding is disabled ON THE BLOOM COLUMNS ONLY:
    * parquet-mr drops the bloom when a chunk stays fully
    * dictionary-encoded (the dictionary already answers membership
    * exactly), so whether the filter exists would otherwise depend on
    * whether this particular file crossed the dictionary-page threshold —
    * exactly the non-determinism a reader planning on footer skipping
    * cannot tolerate. Genuinely high-cardinality keys (the bloom use
    * case) overflow the dictionary anyway, so the override costs nothing
    * at scale and pins the contract at every file size. */
  def saveWithBloomFilters(
      spark: SparkSession,
      table: String,
      df: DataFrame,
      bloomCols: Seq[String],
      ndv: Long,
      nFiles: Int): Unit = {
    dropTableAndLocation(spark, table)
    val base = df.repartition(nFiles)
      .write.format("parquet").option("compression", "zstd")
    bloomCols.foldLeft(base) { (w, c) =>
      w.option(s"parquet.bloom.filter.enabled#$c", "true")
        .option(s"parquet.bloom.filter.expected.ndv#$c", ndv.toString)
        .option(s"parquet.enable.dictionary#$c", "false")
    }.saveAsTable(table)
  }

  /** Persist `df` Z-ORDERED on two columns: each is min-max scaled onto
    * the 16-bit range from a broadcast bounds frame, the scaled values are
    * Morton-interleaved, and the data is range-partitioned + sorted on
    * the interleaved value ([[Layout.clusterZOrdered]], the shared kernel
    * with [[compactTableZOrdered]]). Because the
    * Z-curve alternates bits of both dimensions, every parquet file gets a
    * tight min/max footer range on BOTH columns simultaneously — with
    * `nFiles` files each dimension's per-file span shrinks ~√nFiles×,
    * where [[saveClustered]] tightens only its leading column and leaves
    * the second at full range. This is the plain-parquet analog of
    * Delta/Iceberg Z-ordering, for the two-predicate scans (zone × hour,
    * lang × length) a lakehouse serves. Per-file two-dim narrowing is
    * asserted value-level in TableIOSpec. */
  def saveZOrdered(
      spark: SparkSession,
      table: String,
      df: DataFrame,
      colA: String,
      colB: String,
      nFiles: Int): Unit = {
    import org.apache.spark.sql.functions.col
    dropTableAndLocation(spark, table)
    Layout.clusterZOrdered(df, col(colA), col(colB), nFiles)
      .write.format("parquet").option("compression", "zstd")
      .saveAsTable(table)
  }

  /** What [[compactTable]] did: audit surface for maintenance jobs. */
  final case class CompactionReport(
      partitionsCompacted: Int,
      filesBefore: Int,
      filesAfter: Int,
      bytesRewritten: Long)

  /** Small-file compaction — the OPTIMIZE/binpack maintenance operation
    * every streaming-ingest lakehouse needs (each micro-batch appends a
    * file per partition; a week of 1-minute triggers is 10k files whose
    * open/footer costs dominate scans long before data volume does).
    *
    * Per leaf (partition) directory: data files smaller than
    * `targetBytes` are read once and rewritten as ⌈Σbytes/target⌉ files;
    * files already at or above the target are NOT rewritten (rewriting
    * right-sized files is pure write amplification — the Iceberg binpack
    * rule). Swap order is write-staged → move-in → delete-originals, so a
    * crash can only leave DUPLICATE small files (re-run converges), never
    * missing rows; plain parquet has no transaction log, so compaction is
    * a maintenance-window operation, exactly like Hive-era concatenate.
    * Partition rewrites are independent — at cluster scale they submit as
    * parallel jobs; the loop here is the single-session analog. */
  def compactTable(
      spark: SparkSession,
      table: String,
      targetBytes: Long = 128L * 1024 * 1024): CompactionReport =
    compactTableImpl(spark, table, targetBytes, None)

  /** [[compactTable]] that ALSO z-order-clusters each rewritten partition
    * on two numeric dimensions (`OPTIMIZE ... ZORDER BY (x, y)`): rewritten
    * files get tight min/max ranges in BOTH dimensions, so the parquet
    * reader's row-group stats prune on either predicate — see
    * [[graft.functions.ZOrder]]. Dimension domains are derived per
    * partition from the data being rewritten (a broadcast 1-row bounds
    * frame, no extra driver action), so the clustering adapts to each
    * partition's actual ranges. Same binpack rule and staged-swap crash
    * contract as the plain form. */
  def compactTableZOrdered(
      spark: SparkSession,
      table: String,
      zorderBy: (Column, Column),
      targetBytes: Long = 128L * 1024 * 1024): CompactionReport =
    compactTableImpl(spark, table, targetBytes, Some(zorderBy))

  private def compactTableImpl(
      spark: SparkSession,
      table: String,
      targetBytes: Long,
      zorderBy: Option[(Column, Column)]): CompactionReport = {
    import org.apache.hadoop.fs.Path
    val ident = spark.sessionState.sqlParser.parseTableIdentifier(table)
    val root = new Path(spark.sessionState.catalog.getTableMetadata(ident).location)
    val fs = root.getFileSystem(spark.sessionState.newHadoopConf())

    def isData(p: Path): Boolean =
      !p.getName.startsWith("_") && !p.getName.startsWith(".")
    def leafDirs(dir: Path): Seq[Path] = {
      val entries = fs.listStatus(dir).toSeq
      val subdirs = entries.filter(e => e.isDirectory && isData(e.getPath))
      if (subdirs.isEmpty) Seq(dir) else subdirs.flatMap(e => leafDirs(e.getPath))
    }

    var partitions = 0; var before = 0; var after = 0; var rewritten = 0L
    leafDirs(root).foreach { dir =>
      val files = fs.listStatus(dir).toSeq.filter(s => s.isFile && isData(s.getPath))
      before += files.size
      val small = files.filter(_.getLen < targetBytes)
      if (small.size >= 2) {
        partitions += 1
        val bytes = small.map(_.getLen).sum
        val nOut = math.max(1, ((bytes + targetBytes - 1) / targetBytes).toInt)
        val tmp = new Path(dir, s".graft_compact_${java.util.UUID.randomUUID().toString.take(8)}")
        val df = spark.read.parquet(small.map(_.getPath.toString): _*)
        val rewritten0 = zorderBy match {
          case Some((x, y)) => Layout.clusterZOrdered(df, x, y, nOut)
          case None         => df.coalesce(nOut)
        }
        rewritten0
          .write.format("parquet").option("compression", "zstd")
          .save(tmp.toString)
        val staged = fs.listStatus(tmp).toSeq.filter(s => s.isFile && isData(s.getPath))
        // Every rename must verifiably succeed BEFORE any original is
        // deleted — otherwise a transient FS failure (rename returns
        // false) would delete rows that were never promoted, breaking the
        // "crash leaves duplicates, never missing rows" invariant.
        staged.zipWithIndex.foreach { case (s, i) =>
          val dest = new Path(dir, s"compacted-${tmp.getName.drop(1)}-$i.parquet")
          if (!fs.rename(s.getPath, dest)) {
            throw new java.io.IOException(
              s"compactTable: rename ${s.getPath} -> $dest failed; " +
                "aborting before deleting originals (originals left in place)")
          }
        }
        small.foreach(s => fs.delete(s.getPath, false))
        fs.delete(tmp, true)
        rewritten += bytes
        after += files.size - small.size + staged.size
      } else after += files.size
    }
    spark.catalog.refreshTable(table)
    CompactionReport(partitions, before, after, rewritten)
  }

  /** q126: [[compactTable]] driven end-to-end on a deterministic fixture,
    * its [[CompactionReport]] surfaced as an oracle-checkable row. The
    * fixture fragments `documents` into exactly 16 files (explicit
    * round-robin repartition — AQE never coalesces a user-set count), so
    * the binpack outcome is fully determined: one leaf dir, 16 small
    * files in, ⌈Σbytes/128 MB⌉ = 1 file out, and the table's row count is
    * conserved (the invariant that matters; asserted from the
    * post-compaction table itself, not the input). */
  def compactionReportDemo(t: graft.core.Tables): DataFrame = {
    import org.apache.spark.sql.functions.{col, count, lit, max}
    val spark = t.spark
    val table = s"graft_compact_demo_${(t.dir.hashCode & 0x7fffffff).toHexString}"
    dropTableAndLocation(spark, table)
    t.documents.repartition(16)
      .write.format("parquet").saveAsTable(table)
    val rep = compactTable(spark, table)
    spark.table(table)
      .agg(count(lit(1)).as("rows_after"), max(col("doc_id")).as("max_doc_id"))
      .select(
        lit(rep.partitionsCompacted).as("partitions_compacted"),
        lit(rep.filesBefore).as("files_before"),
        lit(rep.filesAfter).as("files_after"),
        col("rows_after"), col("max_doc_id"))
  }

  /** DuckDB mirror of [[compactionReportDemo]]: the file arithmetic is a
    * deterministic function of the fixture (16 small files → 1), the row
    * conservation comes from the data. */
  val compactionReportDemoSql: String =
    """SELECT 1 AS partitions_compacted, 16 AS files_before,
      |  1 AS files_after, count(*) AS rows_after,
      |  max(doc_id) AS max_doc_id
      |FROM documents""".stripMargin

  /** q128: [[append]]'s merge-schema contract driven end-to-end on a
    * deterministic fixture — epoch 1 lands even-keyed orders on the
    * 3-column schema, epoch 2 appends odd-keyed rows CARRYING a new
    * column, which DDL-evolves the table; pre-evolution rows read the new
    * column as NULL (the Iceberg merge-schema read semantics). The final
    * table content is plain SQL over `orders`, so the evolution round-trip
    * sits under the hash gate, not just TableIOSpec. */
  def appendEvolutionDemo(t: graft.core.Tables): DataFrame = {
    import org.apache.spark.sql.functions.col
    val spark = t.spark
    val table = s"graft_evolve_demo_${(t.dir.hashCode & 0x7fffffff).toHexString}"
    dropTableAndLocation(spark, table)
    t.orders
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
      .filter(col("o_orderkey") % 2 === 0)
      .write.format("parquet").saveAsTable(table)
    append(spark, table,
      t.orders
        .filter(col("o_orderkey") % 2 =!= 0)
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"),
          col("o_orderpriority")))
    spark.table(table).orderBy(col("o_orderkey"))
  }

  /** DuckDB mirror of [[appendEvolutionDemo]]. */
  val appendEvolutionDemoSql: String =
    """SELECT o_orderkey, o_custkey, o_totalprice,
      |  CASE WHEN o_orderkey % 2 <> 0 THEN o_orderpriority END
      |    AS o_orderpriority
      |FROM orders ORDER BY o_orderkey""".stripMargin

  /** q129: [[refreshPartitions]] (atomic dynamic partition overwrite)
    * driven end-to-end — full orders load partitioned by status, then a
    * refresh of ONLY the 'O' partition with bumped prices; untouched
    * partitions must survive byte-identical. The final content is plain
    * SQL over `orders`: the S8 delete-then-append window-refresh
    * discipline under the hash gate. */
  def refreshPartitionsDemo(t: graft.core.Tables): DataFrame = {
    import org.apache.spark.sql.functions.col
    val spark = t.spark
    val table = s"graft_refresh_demo_${(t.dir.hashCode & 0x7fffffff).toHexString}"
    dropTableAndLocation(spark, table)
    val base = t.orders.select(
      col("o_orderkey"), col("o_totalprice"), col("o_orderstatus"))
    base.write.format("parquet")
      .partitionBy("o_orderstatus").saveAsTable(table)
    refreshPartitions(spark, table,
      base.filter(col("o_orderstatus") === "O")
        .withColumn("o_totalprice", col("o_totalprice") + 10))
    spark.table(table).orderBy(col("o_orderkey"))
  }

  /** DuckDB mirror of [[refreshPartitionsDemo]]. */
  val refreshPartitionsDemoSql: String =
    """SELECT o_orderkey,
      |  CASE WHEN o_orderstatus = 'O' THEN o_totalprice + 10
      |       ELSE o_totalprice END AS o_totalprice,
      |  o_orderstatus
      |FROM orders ORDER BY o_orderkey""".stripMargin

  // ── merge-on-read equality deletes ──────────────────────────────────
  //
  // The Iceberg-v2 delete-file discipline re-expressed on plain parquet
  // catalog tables (no Iceberg jar ships in this environment — same
  // substitution stance as sources/Snapshots): a delete writes only the
  // KEYS into `_deletes/` under the table location (metadata-sized);
  // data files are untouched; readers subtract the delete log at scan
  // time; compaction folds deletes in and clears the log. At 100 TB this
  // is the only affordable path for small deletes (GDPR erasure,
  // retracted documents): copy-on-write rewrites TB-scale files for
  // KB-scale deletes, merge-on-read defers that cost to the next
  // compaction and amortizes it. The `_` prefix keeps delete files
  // invisible to the table's own scans (Spark/parquet skip `_`/`.`
  // paths), so the log needs no catalog change.

  private def deletesDir(spark: SparkSession, table: String) = {
    import org.apache.hadoop.fs.Path
    val ident = spark.sessionState.sqlParser.parseTableIdentifier(table)
    new Path(spark.sessionState.catalog.getTableMetadata(ident).location.getPath,
      "_deletes")
  }

  /** Append an equality-delete file: `keys` (a 1-column frame named after
    * the table's key column) lands as one new parquet file in the delete
    * log. Monotone file naming keeps epochs distinguishable; duplicate or
    * overlapping keys across epochs are fine (deletion is idempotent). */
  def writeEqualityDeletes(spark: SparkSession, table: String,
                           keys: org.apache.spark.sql.DataFrame): Unit = {
    val dir = deletesDir(spark, table)
    val fs = dir.getFileSystem(spark.sessionState.newHadoopConf())
    val epoch = if (fs.exists(dir)) fs.listStatus(dir).length else 0
    keys.coalesce(1).write.mode("append")
      .parquet(new org.apache.hadoop.fs.Path(dir, s"epoch_$epoch").toString)
  }

  /** Merge-on-read scan: the table's data files minus the delete log —
    * a broadcast anti-join on the key (the log is keys-only and
    * metadata-sized by contract, so the subtraction never shuffles the
    * data side). With no delete log this is exactly `spark.table`. */
  def readWithDeletes(spark: SparkSession, table: String,
                      keyCol: String): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions.{broadcast, col}
    val dir = deletesDir(spark, table)
    val fs = dir.getFileSystem(spark.sessionState.newHadoopConf())
    val base = spark.table(table)
    if (!fs.exists(dir)) base
    else {
      val dels = spark.read.parquet(s"$dir/epoch_*").select(col(keyCol)).distinct()
      base.join(broadcast(dels), Seq(keyCol), "left_anti")
    }
  }

  /** Compaction: fold the delete log into the data files (rewrite the
    * live rows, atomically swap, clear the log) — after this the plain
    * table scan and [[readWithDeletes]] agree again and the anti-join
    * cost is gone. The rewrite goes through a temp table + location swap
    * so a crash mid-compaction leaves the old files + log intact. */
  def applyDeletes(spark: SparkSession, table: String, keyCol: String): Unit = {
    val live = readWithDeletes(spark, table, keyCol).localCheckpoint()
    val dir = deletesDir(spark, table)
    val fs = dir.getFileSystem(spark.sessionState.newHadoopConf())
    if (fs.exists(dir)) {
      live.write.mode("overwrite").format("parquet")
        .saveAsTable(s"${table}_mor_tmp")
      // insertInto is POSITION-based: re-project into the target's column
      // order (the anti-join in readWithDeletes moves the key column first)
      val targetCols = spark.table(table).columns
      spark.table(s"${table}_mor_tmp")
        .select(targetCols.map(org.apache.spark.sql.functions.col): _*)
        .write.mode("overwrite").insertInto(table)
      dropTableAndLocation(spark, s"${table}_mor_tmp")
      fs.delete(dir, true)
    }
  }

  /** q245: the merge-on-read discipline driven end-to-end — documents
    * loaded as a catalog table, two delete epochs land keys-only files
    * (retraction sweeps: doc_id ≡ 3 mod 7, then ≡ 5 mod 11 — overlapping
    * on purpose), and the per-source live report reads through
    * [[readWithDeletes]]. The report is plain SQL over `documents`, so
    * the delete-file round-trip (epoch append → `_`-invisibility to the
    * base scan → broadcast-anti subtraction) sits under the hash gate;
    * TableIOSpec drives [[applyDeletes]] and the crash-safety contract. */
  def mergeOnReadDemo(t: graft.core.Tables): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions.{col, count, lit, pmod, sum}
    val spark = t.spark
    val table = s"graft_mor_demo_${(t.dir.hashCode & 0x7fffffff).toHexString}"
    dropTableAndLocation(spark, table)
    t.documents.select(col("doc_id"), col("source"), col("n_chars"))
      .write.format("parquet").saveAsTable(table)
    writeEqualityDeletes(spark, table,
      t.documents.filter(pmod(col("doc_id"), lit(7)) === 3).select("doc_id"))
    writeEqualityDeletes(spark, table,
      t.documents.filter(pmod(col("doc_id"), lit(11)) === 5).select("doc_id"))
    readWithDeletes(spark, table, "doc_id")
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_live"), sum(col("n_chars")).as("chars_live"))
      .orderBy(col("source"))
  }

  /** DuckDB mirror of [[mergeOnReadDemo]]. */
  val mergeOnReadDemoSql: String =
    """SELECT source, count(*) AS n_live,
      |  CAST(sum(n_chars) AS BIGINT) AS chars_live
      |FROM documents
      |WHERE NOT (doc_id % 7 = 3 OR doc_id % 11 = 5)
      |GROUP BY 1 ORDER BY 1""".stripMargin

  /** Storage audit: per-partition file count, byte totals, and small-file
    * share — the table-health report that DECIDES when [[compactTable]]
    * runs (Iceberg keeps this in its manifests; plain parquet has to list
    * the filesystem, which is exactly what this does, once, driver-side —
    * a metadata pass, not a data scan). */
  def storageAudit(
      spark: SparkSession,
      table: String,
      smallFileBytes: Long = 128L * 1024 * 1024): DataFrame = {
    import org.apache.hadoop.fs.Path
    import org.apache.spark.sql.functions.{col, when}
    import spark.implicits._
    val ident = spark.sessionState.sqlParser.parseTableIdentifier(table)
    val root = new Path(spark.sessionState.catalog.getTableMetadata(ident).location)
    val fs = root.getFileSystem(spark.sessionState.newHadoopConf())
    def isData(p: Path): Boolean =
      !p.getName.startsWith("_") && !p.getName.startsWith(".")
    def leafDirs(dir: Path): Seq[Path] = {
      val entries = fs.listStatus(dir).toSeq
      val subdirs = entries.filter(e => e.isDirectory && isData(e.getPath))
      if (subdirs.isEmpty) Seq(dir) else subdirs.flatMap(e => leafDirs(e.getPath))
    }
    val rows = leafDirs(root).map { dir =>
      val files = fs.listStatus(dir).toSeq.filter(s => s.isFile && isData(s.getPath))
      val rel = root.toUri.relativize(dir.toUri).getPath.stripSuffix("/")
      val partition = if (rel.isEmpty) "<root>" else rel
      (partition, files.size.toLong,
        files.map(_.getLen).sum,
        files.count(_.getLen < smallFileBytes).toLong)
    }
    rows.toDF("partition", "n_files", "total_bytes", "n_small_files")
      .withColumn("avg_file_bytes",
        when(col("n_files") > 0,
          col("total_bytes") / col("n_files")).otherwise(0L).cast("long"))
      .orderBy(col("partition"))
  }

  /** q172: [[storageAudit]] driven end-to-end on a deterministic layout —
    * a status-partitioned catalog table built by three single-task appends,
    * where append b (b=0,1,2) carries the keys ≡b (mod 3) of the statuses
    * ranked ≥ b (O=0, F=1, P=2). Each append's `coalesce(1)` writes exactly
    * one file into every partition it touches, so the audited per-partition
    * file count is rank+1 by construction and the row count is plain SQL
    * over `orders` — the whole small-file diagnostic sits under the hash
    * gate. Byte-size columns are projected away: parquet file sizes are not
    * replayable from raw data. (Reference maintenance concern:
    * `nyc_taxi_to_iceberg.py` relies on Iceberg's file-size metadata tables
    * for the same audit.) */
  def storageAuditDemo(t: graft.core.Tables): DataFrame = {
    import org.apache.spark.sql.functions._
    val spark = t.spark
    val table = s"graft_audit_demo_${(t.dir.hashCode & 0x7fffffff).toHexString}"
    dropTableAndLocation(spark, table)
    val ranked = t.orders
      .select(col("o_orderkey"), col("o_totalprice"), col("o_orderstatus"))
      .withColumn("status_rank",
        when(col("o_orderstatus") === "O", 0)
          .when(col("o_orderstatus") === "F", 1)
          .otherwise(2))
    (0 to 2).foreach { b =>
      val slice = ranked
        .filter(col("o_orderkey") % 3 === b && col("status_rank") >= b)
        .drop("status_rank")
        .coalesce(1)
      slice.write.format("parquet").partitionBy("o_orderstatus")
        .mode(if (b == 0) "errorifexists" else "append").saveAsTable(table)
    }
    val audit = storageAudit(spark, table)
      .select(col("partition"), col("n_files"), col("n_small_files"))
    val rows = spark.table(table)
      .groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("n_rows"))
      .select(
        concat(lit("o_orderstatus="), col("o_orderstatus")).as("partition"),
        col("n_rows"))
    audit.join(rows, Seq("partition")).orderBy(col("partition"))
  }

  /** DuckDB mirror of [[storageAuditDemo]]: file counts are the rank+1
    * construction constants; row counts replay from `orders`. */
  val storageAuditDemoSql: String =
    """SELECT 'o_orderstatus=' || o_orderstatus AS partition,
      |  CAST(CASE o_orderstatus WHEN 'O' THEN 1 WHEN 'F' THEN 2 ELSE 3 END
      |    AS BIGINT) AS n_files,
      |  CAST(CASE o_orderstatus WHEN 'O' THEN 1 WHEN 'F' THEN 2 ELSE 3 END
      |    AS BIGINT) AS n_small_files,
      |  count(*) AS n_rows
      |FROM orders
      |WHERE o_orderkey % 3 <=
      |  CASE o_orderstatus WHEN 'O' THEN 0 WHEN 'F' THEN 1 ELSE 2 END
      |GROUP BY o_orderstatus
      |ORDER BY partition""".stripMargin

  /** S10: CTAS with partitioning (`nyc_taxi_to_iceberg.py:164-184`). */
  def ctas(
      spark: SparkSession,
      table: String,
      select: DataFrame,
      partitionCols: Seq[String]): Unit = {
    dropTableAndLocation(spark, table)
    val view = s"graft_ctas_src_${table.replaceAll("[^A-Za-z0-9_]", "_")}"
    select.createOrReplaceTempView(view)
    val partClause =
      if (partitionCols.nonEmpty) s"PARTITIONED BY (${partitionCols.mkString(", ")})" else ""
    spark.sql(
      s"""CREATE TABLE $table
         |USING parquet
         |OPTIONS ('compression' 'zstd')
         |$partClause
         |AS SELECT * FROM $view""".stripMargin)
    spark.catalog.dropTempView(view)
  }

  /** q130: [[ctas]] (partitioned CREATE TABLE AS SELECT, the reference's
    * daily_summary pattern `nyc_taxi_to_iceberg.py:164-184`) driven
    * end-to-end — a per-(status, priority) order rollup created as a
    * status-partitioned table, read back through the catalog. The read
    * path reassembles the partition column from directory names, so the
    * oracle catches a partition/value mix-up that a same-session frame
    * compare would not. */
  def ctasDemo(t: graft.core.Tables): DataFrame = {
    import org.apache.spark.sql.functions.{col, count, lit}
    import graft.functions.ExactAgg
    val spark = t.spark
    val table = s"graft_ctas_demo_${(t.dir.hashCode & 0x7fffffff).toHexString}"
    ctas(spark, table,
      t.orders
        .groupBy(col("o_orderstatus"), col("o_orderpriority"))
        .agg(count(lit(1)).as("n_orders"),
          ExactAgg.dsum(col("o_totalprice")).as("sum_price")),
      Seq("o_orderstatus"))
    spark.table(table)
      .orderBy(col("o_orderstatus"), col("o_orderpriority"))
  }

  /** DuckDB mirror of [[ctasDemo]]. */
  val ctasDemoSql: String =
    s"""SELECT o_orderstatus, o_orderpriority, count(*) AS n_orders,
       |  ${graft.functions.ExactAgg.Sql.dsum("o_totalprice")} AS sum_price
       |FROM orders GROUP BY 1, 2
       |ORDER BY o_orderstatus, o_orderpriority""".stripMargin

  /** q131: [[truncateReload]] (S9, the dimension full-refresh) driven
    * end-to-end — load a stale nation dimension, then truncate-reload with
    * the true one; the table must hold exactly the reload, nothing stale
    * surviving the drop. */
  def truncateReloadDemo(t: graft.core.Tables): DataFrame = {
    import org.apache.spark.sql.functions.{col, concat, lit}
    val spark = t.spark
    val table = s"graft_reload_demo_${(t.dir.hashCode & 0x7fffffff).toHexString}"
    truncateReload(spark, table,
      t.nation.withColumn("n_name", concat(lit("STALE_"), col("n_name"))))
    truncateReload(spark, table, t.nation, partitionCols = Seq("n_regionkey"))
    spark.table(table).orderBy(col("n_nationkey"))
  }

  /** DuckDB mirror of [[truncateReloadDemo]]. */
  val truncateReloadDemoSql: String =
    "SELECT * FROM nation ORDER BY n_nationkey"
}
