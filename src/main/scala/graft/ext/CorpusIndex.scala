package graft.ext

import graft.core.Tables
import graft.functions.{KmvSketch, PortableHash}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-index operators: the "build a queryable artifact from the corpus"
  * family a training-data pipeline runs once per snapshot and serves many
  * times — an n-gram next-token table (the infini-gram shape), deterministic
  * token-balanced shard assignment (the training-shard writer's layout
  * decision), and a Bloom seen-shingle membership pre-filter (the crawl
  * "have we seen this before" primitive).
  *
  * All arithmetic is bit-portable (exact integer counts; DOUBLE only as a
  * final single division), so every query here has a DuckDB oracle twin
  * colocated in this file — the [[graft.ext.Multimodal]] / [[SuffixArray]]
  * pattern.
  */
object CorpusIndex {

  // ── q239: n-gram next-token table ────────────────────────────────────

  /** q239: n-gram next-token distribution table — the infini-gram /
    * KN-LM-table build: for the `topContexts` most frequent (n−1)-token
    * contexts, the `topNext` most likely next tokens with exact counts and
    * the conditional probability. At 100 TB this is exactly the build that
    * backs an ∞-gram serving index: one (context, next) count shuffle over
    * the exploded n-grams, everything after it runs on the
    * vocabulary-sized count frame (≪ corpus), top contexts by TakeOrdered
    * (never a global sort), and the kept-context filter is a broadcast
    * semi-join. Reference anchor: the reference's aggregation pipelines
    * (batch_processor.py) group fact rows the same way; the n-gram table
    * is that shape applied to the documents corpus.
    *
    * Ties: contexts by (total DESC, context ASC); next tokens by
    * (count DESC, next ASC) — both total orders, and string comparison is
    * UTF-8 binary in Spark = DuckDB default collation (the q116 contract).
    */
  def nextTokenTable(t: Tables, n: Int = 3, topContexts: Int = 20,
                     topNext: Int = 3): DataFrame = {
    require(n >= 2, s"next-token table needs n >= 2, got $n")
    val grams = t.documents
      .where(size(TextAnalysis.tokens(col("text"))) >= n)
      .select(explode(Dedup.shingles(col("text"), n)).as("gram"))
    val counts = grams
      .groupBy(
        substring_index(col("gram"), " ", n - 1).as("context"),
        substring_index(col("gram"), " ", -1).as("next"))
      .agg(count(lit(1)).as("cnt"))
    val totals = counts.groupBy("context")
      .agg(sum("cnt").as("context_total"))
    val top = totals
      .orderBy(desc("context_total"), asc("context"))
      .limit(topContexts) // TakeOrdered — no global sort materializes
    counts
      .join(broadcast(top), Seq("context"))
      .withColumn("rnk", row_number().over(
        Window.partitionBy("context").orderBy(desc("cnt"), asc("next"))))
      .where(col("rnk") <= topNext)
      .select(
        col("context"), col("next"), col("cnt"), col("context_total"),
        (col("cnt").cast("double") / col("context_total").cast("double"))
          .as("prob"),
        col("rnk").cast("int").as("rnk"))
      .orderBy(desc("context_total"), asc("context"), asc("rnk"))
  }

  /** DuckDB twin of [[nextTokenTable]]: token split, n-gram unnest, and the
    * same two-tiebreak rankings. `sum(cnt)` is CAST to BIGINT (DuckDB sums
    * to HUGEINT — the q132 type trap). */
  def nextTokenTableSql(n: Int = 3, topContexts: Int = 20,
                        topNext: Int = 3): String =
    s"""WITH tk AS (
       |  SELECT string_split_regex(trim(text), '\\s+') AS tks FROM documents),
       |g AS (
       |  SELECT array_to_string(tks[i:i+${n - 2}], ' ') AS context,
       |         tks[i+${n - 1}] AS next
       |  FROM tk, unnest(range(1, len(tks) - ${n - 2})) u(i)
       |  WHERE len(tks) >= $n),
       |c AS (SELECT context, next, count(*) AS cnt FROM g GROUP BY 1, 2),
       |tot AS (SELECT context, CAST(sum(cnt) AS BIGINT) AS context_total
       |        FROM c GROUP BY 1),
       |top AS (SELECT context, context_total FROM tot
       |        ORDER BY context_total DESC, context LIMIT $topContexts),
       |r AS (
       |  SELECT c.context, c.next, c.cnt, t.context_total,
       |    row_number() OVER (PARTITION BY c.context
       |                       ORDER BY c.cnt DESC, c.next) AS rnk
       |  FROM c JOIN top t ON t.context = c.context)
       |SELECT context, next, cnt, context_total,
       |  CAST(cnt AS DOUBLE) / CAST(context_total AS DOUBLE) AS prob,
       |  CAST(rnk AS INTEGER) AS rnk
       |FROM r WHERE rnk <= $topNext
       |ORDER BY context_total DESC, context, rnk""".stripMargin

  /** Session-scoped build-once guard for [[nextTokenServedDemo]]'s index
    * tables (the q127 / [[graft.operators.Bucketed]] pattern). */
  private val ntIdxBuilt =
    java.util.concurrent.ConcurrentHashMap.newKeySet[String]()

  /** Persist the FULL next-token table as bucketed index tables — the
    * cross-session serve artifact behind [[nextTokenServedDemo]]: counts
    * bucketed BY context so a per-context ranked lookup is co-located
    * (the bucketed scan already satisfies the window's required
    * distribution — no exchange at serve time), plus the per-context
    * totals the "most frequent contexts" entry point reads without
    * touching the counts table. */
  def writeNextTokenIndex(t: Tables, prefix: String, n: Int = 3,
                          nBuckets: Int = 8): Unit = {
    val counts = t.documents
      .where(size(TextAnalysis.tokens(col("text"))) >= n)
      .select(explode(Dedup.shingles(col("text"), n)).as("gram"))
      .groupBy(
        substring_index(col("gram"), " ", n - 1).as("context"),
        substring_index(col("gram"), " ", -1).as("next"))
      .agg(count(lit(1)).as("cnt"))
      .localCheckpoint() // one corpus pass feeds both index tables
    graft.sources.TableIO.dropTableAndLocation(t.spark, s"${prefix}_counts")
    counts.write.format("parquet").option("compression", "zstd")
      .bucketBy(nBuckets, "context")
      .saveAsTable(s"${prefix}_counts")
    graft.sources.TableIO.dropTableAndLocation(t.spark, s"${prefix}_totals")
    counts.groupBy("context").agg(sum("cnt").as("context_total"))
      .write.format("parquet").option("compression", "zstd")
      .bucketBy(nBuckets, "context")
      .saveAsTable(s"${prefix}_totals")
  }

  /** q244: the next-token table SERVED from the persisted index — build
    * the bucketed index tables once ([[writeNextTokenIndex]], exactly the
    * production rebuild job), then answer the q239 question (top contexts,
    * ranked next tokens) purely from the index: totals give the entry
    * points via TakeOrdered, count rows join the broadcast context set,
    * and the per-context rank window rides the bucketed scan's
    * distribution. The result is IDENTICAL to [[nextTokenTable]] — counts
    * are counts however they are stored — so q239's DuckDB oracle replays
    * this path too, putting the index round-trip (bucketed write → read →
    * ranked lookup) under the hash gate. At 100 TB this is the shape that
    * matters: the corpus is touched once per snapshot at build time;
    * every lookup afterwards reads one context's bucket. */
  def nextTokenServedDemo(t: Tables, n: Int = 3, topContexts: Int = 20,
                          topNext: Int = 3): DataFrame = {
    val spark = t.spark
    val tag = ((t.dir, n).hashCode & 0x7fffffff).toHexString
    val prefix = s"graft_ntidx_$tag"
    val key = s"${System.identityHashCode(spark.sessionState)}:$prefix"
    if (ntIdxBuilt.add(key) || !spark.catalog.tableExists(s"${prefix}_counts"))
      writeNextTokenIndex(t, prefix, n)
    val top = spark.table(s"${prefix}_totals")
      .orderBy(desc("context_total"), asc("context"))
      .limit(topContexts)
    spark.table(s"${prefix}_counts")
      .join(broadcast(top), Seq("context"))
      .withColumn("rnk", row_number().over(
        Window.partitionBy("context").orderBy(desc("cnt"), asc("next"))))
      .where(col("rnk") <= topNext)
      .select(
        col("context"), col("next"), col("cnt"), col("context_total"),
        (col("cnt").cast("double") / col("context_total").cast("double"))
          .as("prob"),
        col("rnk").cast("int").as("rnk"))
      .orderBy(desc("context_total"), asc("context"), asc("rnk"))
  }

  // ── q240: token-balanced shard assignment ─────────────────────────────

  /** q240: deterministic token-balanced shard assignment — the training
    * shard writer's layout step: assign every document a shard in
    * [0, nShards) such that shards carry near-equal TOKEN mass (docs vary
    * 100× in length, so doc-count-balanced ≠ token-balanced), in a
    * deterministic, layout-independent order.
    *
    * Algorithm: a DISTRIBUTED PREFIX SUM (the classic two-phase scan).
    * Docs order by (splitHash(doc_id), doc_id) — the portable hash order
    * every sampling op here rides, so assignment never changes with
    * partitioning or corpus layout. Phase 1 ranges that order into
    * `nBuckets` hash-range buckets (bucket = h DIV ⌈M/nBuckets⌉ is
    * monotone in h, so bucket order ≡ global order) and aggregates one
    * token subtotal per bucket; phase 2 runs the single-partition window
    * ONLY over the nBuckets-row subtotal frame (bounded at any corpus
    * scale), broadcasts the per-bucket prefixes back, and the within-bucket
    * cumulative window shuffles on bucket — the one data-sized exchange.
    * A naive global `Window.orderBy` would drag the whole corpus through
    * one partition; this is the 100 TB-safe form of the same scan.
    *
    * shard = ⌊cum_before · nShards / total⌋ (clamped to nShards−1 for the
    * boundary row) — contiguous token-quantile sharding, so shard token
    * mass differs by at most one document. Output: per-shard doc count,
    * token mass, and share of total — the report a shard writer logs. */
  def tokenBalancedShards(t: Tables, nShards: Int = 8,
                          nBuckets: Int = 64): DataFrame = {
    require(nShards >= 1 && nBuckets >= 1)
    val bdiv = KmvSketch.M / nBuckets + 1 // ceil-ish divisor: bucket < nBuckets
    val docs = t.documents
      .select(
        col("doc_id"),
        size(TextAnalysis.tokens(col("text"))).cast("long").as("tok"),
        Sampling.splitHash(col("doc_id")).as("h"))
      .withColumn("bucket", expr(s"h DIV $bdiv"))
    val btot = docs.groupBy("bucket").agg(sum("tok").as("btok"))
    // nBuckets rows: the single-partition window is bounded by design
    val bprefix = btot.withColumn(
      "bucket_prefix",
      coalesce(sum("btok").over(
        Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, -1)),
        lit(0L)))
      .select("bucket", "bucket_prefix")
    val total = docs.agg(sum("tok").as("total")) // 1-row broadcast frame
    val cum = docs
      .withColumn("cum_in_bucket", sum("tok").over(
        Window.partitionBy("bucket").orderBy(col("h"), col("doc_id"))
          .rowsBetween(Window.unboundedPreceding, 0)))
      .join(broadcast(bprefix), Seq("bucket"))
      .crossJoin(broadcast(total))
      .withColumn("cum_before",
        col("bucket_prefix") + col("cum_in_bucket") - col("tok"))
      .withColumn("shard",
        least(expr(s"(cum_before * $nShards) DIV total"), lit(nShards - 1L)))
    cum.groupBy("shard")
      .agg(count(lit(1)).as("n_docs"), sum("tok").as("n_tokens"),
           first("total").as("total"))
      .select(
        col("shard").cast("int").as("shard"), col("n_docs"), col("n_tokens"),
        (col("n_tokens").cast("double") / col("total").cast("double"))
          .as("share"))
      .orderBy("shard")
  }

  /** DuckDB twin of [[tokenBalancedShards]]: the two-phase scan collapses
    * to one global window (bucket = f(h) is monotone in h, so
    * (bucket, h, doc_id) order ≡ (h, doc_id) order — the equivalence the
    * engine's scaladoc proves), same shard formula, same clamp. */
  def tokenBalancedShardsSql(nShards: Int = 8): String =
    s"""WITH d AS (
       |  SELECT doc_id,
       |    CAST(len(string_split_regex(trim(text), '\\s+')) AS BIGINT) AS tok,
       |    (${Sampling.splitHashSql("doc_id")}) AS h
       |  FROM documents),
       |t AS (SELECT CAST(sum(tok) AS BIGINT) AS total FROM d),
       |c AS (
       |  SELECT tok,
       |    CAST(sum(tok) OVER (ORDER BY h, doc_id
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
       |      - tok AS cum_before
       |  FROM d),
       |s AS (
       |  SELECT least((cum_before * $nShards) // t.total, ${nShards - 1}) AS shard,
       |         tok, t.total
       |  FROM c, t)
       |SELECT CAST(shard AS INTEGER) AS shard, count(*) AS n_docs,
       |  CAST(sum(tok) AS BIGINT) AS n_tokens,
       |  CAST(sum(tok) AS DOUBLE) / CAST(any_value(total) AS DOUBLE) AS share
       |FROM s GROUP BY 1 ORDER BY 1""".stripMargin

  // ── q241: Bloom seen-shingle membership pre-filter ────────────────────

  /** q241: Bloom "seen-shingle" membership pre-filter with false-positive
    * accounting — the crawl-dedup primitive (Broder's shingling + a Bloom
    * filter over the seen set): the STORED corpus's distinct word-3-shingles
    * populate an mBits-bit Bloom filter (k portable double-hash positions
    * per element); INCOMING shingles are flagged when every probe position
    * is set. The exact membership truth (a shuffle join on the shingle
    * strings — the cost the Bloom exists to avoid at 100 TB; computed here
    * for the audit, sampled in production) splits flags into true/false
    * positives and verifies the filter's NO-FALSE-NEGATIVE invariant
    * (`missed` must be 0 — a Bloom that misses a member is broken, and the
    * oracle hash-checks that 0).
    *
    * Scale shape: the bit array is represented as its set-position set —
    * bounded by mBits rows (≤ 2^16 here) NO MATTER how large the stored
    * corpus grows, broadcast to the probe side; the probe is a broadcast
    * join + per-shingle counter, never a shuffle of the stored corpus.
    * Position arithmetic is the portable splitHash over [[PortableHash
    * .hash62]] of the shingle (h_i = splitHash(hash62(s) + i) mod m — the
    * Kirsch–Mitzenmacher-style derived probes, replayable in SQL), so the
    * oracle rebuilds the identical filter bit-for-bit.
    *
    * Sizing note pinned by the fixture: stored ≈ 6k shingles → k·n ≈ 18k
    * probes into 2^16 bits ≈ 24% load → FP ≈ load^k ≈ 1.4% — a measurable
    * false-positive band, so the report's fp_rate actually exercises the
    * accounting (an oversized filter would report 0.0 and test nothing). */
  def bloomSeenShingles(t: Tables, nStoredSources: Int = 5,
                        mBits: Int = 1 << 16, k: Int = 3): DataFrame = {
    require(k >= 1 && mBits >= 2)
    PortableHash.registerHash62(t.spark)
    val storedSet = (0 until nStoredSources).map("src" + _)
    val sh = t.documents
      .select(col("source"), explode(Dedup.shingles(col("text"))).as("s"))
    val stored = sh.where(col("source").isin(storedSet: _*))
      .select("s").distinct().localCheckpoint() // shingled once, probed twice
    val incoming = sh.where(!col("source").isin(storedSet: _*))
      .select("s").distinct()
    def positions(c: Column): Column = array((0 until k).map(i =>
      pmod(Sampling.splitHash(PortableHash.hash62Col(c) + lit(i.toLong)),
        lit(mBits.toLong))): _*)
    val storedBits = stored
      .select(explode(positions(col("s"))).as("pos")).distinct()
      .localCheckpoint() // the filter artifact: ≤ mBits rows
    val bitsSet = storedBits.agg(count(lit(1)).as("bits_set"))
    val nStored = stored.agg(count(lit(1)).as("n_stored"))
    val probed = incoming
      .select(col("s"), explode(positions(col("s"))).as("pos"))
      .join(broadcast(storedBits.withColumn("hit", lit(1))), Seq("pos"), "left")
      .groupBy("s")
      .agg(
        countDistinct(col("pos")).as("n_pos"),
        countDistinct(when(col("hit").isNotNull, col("pos"))).as("n_hit"))
      .withColumn("flagged", (col("n_hit") === col("n_pos")).cast("long"))
      // truth: the exact seen-set join the filter stands in for
      .join(stored.withColumn("member", lit(1L)), Seq("s"), "left")
      .withColumn("member", coalesce(col("member"), lit(0L)))
    probed.agg(
        count(lit(1)).as("n_incoming"),
        sum("member").as("n_member"),
        sum("flagged").as("n_flagged"),
        sum(col("member") * col("flagged")).as("true_pos"),
        sum((lit(1L) - col("member")) * col("flagged")).as("false_pos"),
        sum(col("member") * (lit(1L) - col("flagged"))).as("missed"))
      .crossJoin(broadcast(nStored))
      .crossJoin(broadcast(bitsSet))
      .select(
        col("n_stored"), col("bits_set"),
        (col("bits_set").cast("double") / lit(mBits.toDouble)).as("load_factor"),
        col("n_incoming"), col("n_member"), col("n_flagged"),
        col("true_pos"), col("false_pos"), col("missed"),
        (col("false_pos").cast("double") /
          (col("n_incoming") - col("n_member")).cast("double")).as("fp_rate"))
  }

  /** DuckDB twin of [[bloomSeenShingles]]: same shingling (the q34 token
    * CASE — short docs contribute their whole token string), same probe
    * positions from the hash62 + splitHash replay, same flag/truth
    * cross-tab. */
  def bloomSeenShinglesSql(nStoredSources: Int = 5, mBits: Int = 1 << 16,
                           k: Int = 3): String = {
    val storedIn = (0 until nStoredSources).map(i => s"'src$i'").mkString(", ")
    val posExprs = (0 until k).map { i =>
      s"(${Sampling.splitHashSql(s"(${PortableHash.hash62Sql("s")}) + $i")}) % $mBits"
    }.mkString("[", ", ", "]")
    s"""WITH tk AS (
       |  SELECT source, string_split_regex(trim(text), '\\s+') AS tks
       |  FROM documents),
       |sh AS (
       |  SELECT source, unnest(
       |    CASE WHEN len(tks) < 3 THEN [array_to_string(tks, ' ')]
       |         ELSE list_transform(range(1, len(tks) - 1),
       |                i -> array_to_string(tks[i:i+2], ' ')) END) AS s
       |  FROM tk),
       |stored AS (
       |  SELECT DISTINCT s FROM sh WHERE source IN ($storedIn)),
       |incoming AS (
       |  SELECT DISTINCT s FROM sh WHERE source NOT IN ($storedIn)),
       |bits AS (
       |  SELECT DISTINCT unnest($posExprs) AS pos FROM stored),
       |probe AS (
       |  SELECT s, unnest($posExprs) AS pos FROM incoming),
       |flags AS (
       |  SELECT p.s,
       |    CASE WHEN count(DISTINCT CASE WHEN b.pos IS NOT NULL THEN p.pos END)
       |           = count(DISTINCT p.pos) THEN 1 ELSE 0 END AS flagged
       |  FROM probe p LEFT JOIN bits b ON b.pos = p.pos
       |  GROUP BY p.s),
       |truth AS (
       |  SELECT f.s, f.flagged,
       |    CASE WHEN st.s IS NOT NULL THEN 1 ELSE 0 END AS member
       |  FROM flags f LEFT JOIN stored st ON st.s = f.s)
       |SELECT
       |  (SELECT count(*) FROM stored) AS n_stored,
       |  (SELECT count(*) FROM bits) AS bits_set,
       |  CAST((SELECT count(*) FROM bits) AS DOUBLE) / $mBits AS load_factor,
       |  count(*) AS n_incoming,
       |  CAST(sum(member) AS BIGINT) AS n_member,
       |  CAST(sum(flagged) AS BIGINT) AS n_flagged,
       |  CAST(sum(member * flagged) AS BIGINT) AS true_pos,
       |  CAST(sum((1 - member) * flagged) AS BIGINT) AS false_pos,
       |  CAST(sum(member * (1 - flagged)) AS BIGINT) AS missed,
       |  CAST(sum((1 - member) * flagged) AS DOUBLE)
       |    / CAST(count(*) - sum(member) AS DOUBLE) AS fp_rate
       |FROM truth""".stripMargin
  }
}
