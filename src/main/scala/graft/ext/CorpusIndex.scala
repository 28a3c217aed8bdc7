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

  /** One-tokenization n-gram occurrence stream — the shared scan shape of
    * every scorer/index pass in this file: tokenize `text` ONCE into an
    * array column, filter on its size, and expand k-grams with the native
    * [[graft.functions.WordShingles]] loop (byte-identical to the
    * composable [[Dedup.shingles]] form — pinned in its scaladoc and
    * asserted in tests). The previous per-site form
    * `where(size(tokens(text)) >= k).select(explode(Dedup.shingles(text, k)))`
    * regex-tokenized each row TWICE (filter + shingle both re-split) and
    * built shingles through `transform(sequence(...))` — Catalyst HOFs are
    * CodegenFallback and walk an interpreted expression tree per produced
    * gram (the repo's own codegen note). On the scorer family every corpus
    * pass paid that; measured at sf0.1 the swap cuts the q246 family's
    * scan stages roughly in half. `minTokens = 0` keeps the short-doc
    * whole-string shingle (the q241 unfiltered shape). */
  private def gramExplode(docs: DataFrame, k: Int, gramCol: String,
                          minTokens: Int, keep: String*): DataFrame = {
    graft.functions.ShingleExpression.register(docs.sparkSession)
    val tks = docs.select(
      keep.map(col) :+ TextAnalysis.tokens(col("text")).as("_graft_tks"): _*)
    val filtered =
      if (minTokens > 0) tks.where(size(col("_graft_tks")) >= minTokens)
      else tks
    filtered.select(
      keep.map(col) :+ explode(
        graft.functions.ShingleExpression.wordShingles(col("_graft_tks"), k))
        .as(gramCol): _*)
  }

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
    * (airflow/dags/spark_jobs/comprehensive_analytics.py) group fact rows
    * the same way; the n-gram table is that shape applied to the
    * documents corpus.
    *
    * Ties: contexts by (total DESC, context ASC); next tokens by
    * (count DESC, next ASC) — both total orders, and string comparison is
    * UTF-8 binary in Spark = DuckDB default collation (the q116 contract).
    */
  def nextTokenTable(t: Tables, n: Int = 3, topContexts: Int = 20,
                     topNext: Int = 3): DataFrame = {
    require(n >= 2, s"next-token table needs n >= 2, got $n")
    val grams = gramExplode(t.documents, n, "gram", minTokens = n)
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

  /** Ensure the q244 bucketed next-token index exists for (corpus, n) and
    * return its table prefix — the [[graft.sources.ArtifactTables]] guard
    * (strong tag + recorded source identity) around
    * [[writeNextTokenIndex]]. */
  private def ntIndexPrefix(t: Tables, n: Int): String = {
    import graft.sources.ArtifactTables
    val ident = Seq(t.dir, "ntidx", s"n=$n")
    val prefix = s"graft_ntidx_${ArtifactTables.tag(ident: _*)}"
    ArtifactTables.ensure(t.spark, prefix,
      Seq(s"${prefix}_counts", s"${prefix}_totals"), ident.mkString("|")) {
      writeNextTokenIndex(t, prefix, n)
    }
    prefix
  }

  /** Persist the FULL next-token table as bucketed index tables — the
    * cross-session serve artifact behind [[nextTokenServedDemo]]: counts
    * bucketed BY context so a per-context ranked lookup is co-located
    * (the bucketed scan already satisfies the window's required
    * distribution — no exchange at serve time), plus the per-context
    * totals the "most frequent contexts" entry point reads without
    * touching the counts table. */
  def writeNextTokenIndex(t: Tables, prefix: String, n: Int = 3,
                          nBuckets: Int = 8): Unit = {
    val counts = gramExplode(t.documents, n, "gram", minTokens = n)
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
    val prefix = ntIndexPrefix(t, n)
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

  /** The point-lookup plan: given a CONTEXT, its ranked next-token
    * distribution straight from the bucketed index — the serving tier's
    * per-request shape. The equality filter prunes the scan to ONE bucket
    * (`SelectedBucketsCount: 1 out of N` in the plan), the bucketed scan's
    * hash distribution already satisfies the rank window (local sort, no
    * exchange), and the final presentation order rides TakeOrdered — the
    * whole lookup plans with ZERO exchanges and never scans the other
    * buckets (pinned by PlanAuditSpec's q249 lint). `ctxTotal` arrives
    * with the request (the totals-table read that produced the context),
    * so the lookup touches exactly one table. */
  def nextTokenLookup(spark: org.apache.spark.sql.SparkSession, prefix: String,
                      ctx: String, ctxTotal: Long, topK: Int): DataFrame =
    spark.table(s"${prefix}_counts")
      .where(col("context") === lit(ctx))
      .withColumn("rnk", row_number().over(
        Window.partitionBy("context").orderBy(desc("cnt"), asc("next"))))
      .where(col("rnk") <= topK)
      .select(
        col("context"), col("next"), col("cnt"),
        lit(ctxTotal).as("context_total"),
        (col("cnt").cast("double") / lit(ctxTotal).cast("double")).as("prob"),
        col("rnk").cast("int").as("rnk"))
      .orderBy(col("rnk")).limit(topK) // TakeOrdered — no range exchange

  /** q249: the POINT-LOOKUP entry of the served next-token index — q244
    * answers "top contexts, ranked next tokens" from the persisted index;
    * this answers the serving tier's other question: "given ONE context,
    * its full ranked next-token distribution", reading exactly one bucket
    * of the bucketed index with a zero-exchange plan ([[nextTokenLookup]]).
    * The demo parameterization picks the corpus's most frequent context
    * (ties by context ASC) via a bounded 1-row read of the totals table —
    * exactly what a serving request supplies as its parameter. Results are
    * IDENTICAL to [[nextTokenTable]] restricted to that context, so the
    * q239 oracle with topContexts=1 replays this path and puts the
    * index → bucket-pruned lookup round-trip under the hash gate. */
  def nextTokenLookupDemo(t: Tables, n: Int = 3, topK: Int = 100): DataFrame = {
    val spark = t.spark
    val prefix = ntIndexPrefix(t, n)
    // take(1), not head(): an empty corpus (or all docs shorter than n
    // tokens) yields an empty index, and the demo should fail loudly —
    // mirroring knModel's empty-train guard — not with NoSuchElement
    val top = spark.table(s"${prefix}_totals")
      .orderBy(desc("context_total"), asc("context")).limit(1).take(1)
      .headOption.getOrElse(throw new IllegalStateException(
        s"next-token index '$prefix' is empty — no document holds >= $n " +
          "tokens, so there is no context to look up"))
    nextTokenLookup(spark, prefix, top.getString(0), top.getLong(1), topK)
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
    val sh = gramExplode(t.documents, 3, "s", minTokens = 0, "source")
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

  // ── q246: Stupid Backoff held-out LM scoring ──────────────────────────

  /** q246: Stupid Backoff language-model scoring of a held-out split — the
    * model-free corpus-quality scorer (Brants et al. 2007, "Large Language
    * Models in Machine Translation", the n-gram score built FOR distributed
    * MapReduce corpora; the CCNet/KenLM quality-filter shape run without a
    * trained model). Train-side n-gram counts (trigram/bigram/unigram over
    * the deterministic [[Sampling.hashBucket]] `< trainPct` split — the q48
    * split discipline, so membership never changes with corpus layout)
    * score every held-out trigram occurrence:
    *
    *   S(w₃|w₁w₂) = c₃(w₁w₂w₃)/c₂(w₁w₂)            if the trigram was seen,
    *              = α · c₂(w₂w₃)/c₁(w₂)             else if the bigram was,
    *              = α² · c₁(w₃)/N                   else if the word was,
    *              = α²/N                            for OOV (count-1 floor),
    *
    * with α = 0.4 (the paper's constant). Scores are carried in the LOG
    * domain — per document the score is the mean per-token log₁₀ S, the
    * KenLM/CCNet quality-filter convention (the r8 ADVICE finding: a raw-
    * probability mean run through the [[graft.functions.ExactAgg.dsum]]
    * micro-unit quantization floors every sub-5e-7 value to 0, so the
    * α²·c₁/N and α²/N branches carried no signal once N grew past ~300k;
    * in log₁₀ domain the same 1e-6 quantum is a uniform 1e-6 absolute
    * log error ≈ 2.3e-6 RELATIVE probability precision at every
    * magnitude, so low-order backoffs keep their weight at any corpus
    * size). The report aggregates per source: how many occurrences
    * resolved at each order (the distribution-shift signal — a source
    * whose text the train split has never seen backs off constantly) and
    * the mean document log-score (higher = better modeled by train).
    *
    * Scale shape: scoring happens per DISTINCT held-out trigram TYPE
    * (≪ occurrences on natural corpora — Heaps' law, q179), then one
    * type→occurrence join fans scores back out; count tables, the type
    * frame, and the occurrence frame are all corpus-linear and every join
    * is an equi-join on an n-gram key — no global windows, no driver
    * state, nothing quadratic. This is exactly the q239 next-token index
    * consumed as a scorer: on a cluster the count tables are the persisted
    * [[writeNextTokenIndex]] artifacts and the corpus is touched once.
    *
    * All branch arithmetic is integer counts with a fixed chain of IEEE
    * double ops; the final log₁₀ is the one non-correctly-rounded-by-spec
    * step (Java intrinsic vs libm may differ in the last ulp), which the
    * micro-unit quantization absorbs — a 1-ulp input difference moves the
    * 1e-6-unit rounding only for values within ~1e-10 units of a .5
    * boundary. The DuckDB twin ([[backoffLmScoreSql]]) replays the
    * identical chain. */
  def backoffLmScore(t: Tables, trainPct: Int = 80,
                     alpha: Double = 0.4): DataFrame = {
    val E = graft.functions.ExactAgg
    backoffPerDoc(t, trainPct, alpha).groupBy("source")
      .agg(
        count(lit(1)).as("n_docs"),
        sum("n_occ").as("n_occ"),
        sum("n3").as("n_trigram"),
        sum("n2").as("n_bigram"),
        sum("n1").as("n_unigram"),
        sum("n0").as("n_oov"),
        E.davg(col("doc_log10")).as("avg_doc_log10"))
      .orderBy("source")
  }

  /** The per-document half of [[backoffLmScore]] — (doc_id, source, order
    * counts, doc_log10) for every held-out doc; shared by the q246 rollup
    * and the q255 scorer-agreement cube. */
  private[graft] def backoffPerDoc(t: Tables, trainPct: Int = 80,
                                 alpha: Double = 0.4): DataFrame = {
    require(trainPct >= 1 && trainPct <= 99,
      s"trainPct must be in [1, 99], got $trainPct")
    val E = graft.functions.ExactAgg
    val docs = t.documents.select(col("doc_id"), col("source"), col("text"),
      Sampling.hashBucket(col("doc_id")).as("b"))
    val train = docs.where(col("b") < trainPct)
    val held  = docs.where(col("b") >= trainPct)

    val c3 = gramExplode(train, 3, "tri", minTokens = 3)
      .groupBy("tri").agg(count(lit(1)).as("c3"))
    // c2/c1 each feed two joins; they are deliberately NOT checkpointed —
    // recomputing the count frame per consumer keeps every stage pipelined
    // and measured ~2× faster than materializing (the q138
    // localCheckpoint-block lesson)
    val c2 = gramExplode(train, 2, "g2", minTokens = 2)
      .groupBy("g2").agg(count(lit(1)).as("c2"))
    val c1 = train
      .select(explode(TextAnalysis.tokens(col("text"))).as("w"))
      .groupBy("w").agg(count(lit(1)).as("c1"))
    // N = total train tokens — derived from c1, no second corpus pass. The
    // empty-train guard is folded INTO the n_train column itself (not a
    // side assert_true column — column pruning silently removed that form,
    // the r8 ADVICE finding): every score branch consumes n_train, so the
    // raise_error is un-prunable and an empty train split fails LOUDLY
    // instead of silently scoring against null counts.
    val nTrain = c1.agg(sum("c1").as("n_train0"))
      .select(
        when(col("n_train0").isNotNull && col("n_train0") > 0, col("n_train0"))
          .otherwise(raise_error(lit(
            "train split is empty — no n-gram evidence to score against")))
          .as("n_train"))

    val occ = gramExplode(held, 3, "tri", minTokens = 3, "doc_id", "source")
    // score once per trigram TYPE; a seen trigram's context bigram / a seen
    // bigram's context word are guaranteed present in train (subset grams
    // of the same train occurrence), so the used denominators are non-null
    val types = occ.select("tri").distinct()
      .withColumn("b_ctx", substring_index(col("tri"), " ", 2))
      .withColumn("b_nxt", substring_index(col("tri"), " ", -2))
      .withColumn("u_ctx", substring_index(substring_index(col("tri"), " ", 2), " ", -1))
      .withColumn("u_nxt", substring_index(col("tri"), " ", -1))
    val a  = lit(alpha)
    val a2 = lit(alpha) * lit(alpha)
    val scored = types
      .join(c3, Seq("tri"), "left")
      .join(c2.select(col("g2").as("b_ctx"), col("c2").as("c2ctx")), Seq("b_ctx"), "left")
      .join(c2.select(col("g2").as("b_nxt"), col("c2").as("c2nxt")), Seq("b_nxt"), "left")
      .join(c1.select(col("w").as("u_ctx"), col("c1").as("c1ctx")), Seq("u_ctx"), "left")
      .join(c1.select(col("w").as("u_nxt"), col("c1").as("c1nxt")), Seq("u_nxt"), "left")
      .crossJoin(broadcast(nTrain))
      .withColumn("ord",
        when(col("c3").isNotNull, lit(3))
          .when(col("c2nxt").isNotNull, lit(2))
          .when(col("c1nxt").isNotNull, lit(1))
          .otherwise(lit(0)))
      .withColumn("score", log10(
        when(col("ord") === 3,
          col("c3").cast("double") / col("c2ctx").cast("double"))
          .when(col("ord") === 2,
            a * (col("c2nxt").cast("double") / col("c1ctx").cast("double")))
          .when(col("ord") === 1,
            a2 * (col("c1nxt").cast("double") / col("n_train").cast("double")))
          .otherwise(a2 / col("n_train").cast("double"))))
      .select("tri", "ord", "score")
    val perDoc = occ.join(scored, Seq("tri"))
      .groupBy("doc_id", "source")
      .agg(
        count(lit(1)).as("n_occ"),
        sum(when(col("ord") === 3, 1L).otherwise(0L)).as("n3"),
        sum(when(col("ord") === 2, 1L).otherwise(0L)).as("n2"),
        sum(when(col("ord") === 1, 1L).otherwise(0L)).as("n1"),
        sum(when(col("ord") === 0, 1L).otherwise(0L)).as("n0"),
        E.davg(col("score")).as("doc_log10"))
    perDoc
  }

  /** DuckDB twin of [[backoffLmScore]]: same split hash, same train count
    * tables, the same backoff CASE with the identical chain of double ops,
    * and the dsum/davg mirrors for both aggregation levels. Scoring runs
    * per occurrence (the engine scores per type then fans out — same
    * values, score is a function of the type alone). */
  /** The shared WITH prologue every held-out scorer twin opens with:
    * tokenized docs + the deterministic split. */
  private def splitCtes(trainPct: Int): String = {
    val h = s"((${Sampling.splitHashSql("doc_id")}) % 100)"
    s"""d AS (
       |  SELECT doc_id, source,
       |         string_split_regex(trim(text), '\\s+') AS tks,
       |         $h AS b
       |  FROM documents),
       |tr AS (SELECT * FROM d WHERE b < $trainPct),
       |ho AS (SELECT * FROM d WHERE b >= $trainPct)""".stripMargin
  }

  /** The per-doc Stupid-Backoff CTE chain ending at `${p}doc(doc_id,
    * source, order counts, doc_log10)` — every CTE name carries prefix
    * `p` so several scorer chains can coexist in one WITH (q255); with
    * p = "" this is exactly the q246 oracle's chain. Assumes the
    * [[splitCtes]] `tr`/`ho` CTEs are in scope. */
  private def backoffDocCtes(alpha: Double, p: String): String = {
    val O = graft.functions.ExactAgg.Sql
    s"""${p}c3 AS (
       |  SELECT array_to_string(tks[i:i+2], ' ') AS tri, count(*) AS c3
       |  FROM tr, unnest(range(1, len(tks) - 1)) u(i)
       |  WHERE len(tks) >= 3 GROUP BY 1),
       |${p}c2 AS (
       |  SELECT array_to_string(tks[i:i+1], ' ') AS g2, count(*) AS c2
       |  FROM tr, unnest(range(1, len(tks))) u(i)
       |  WHERE len(tks) >= 2 GROUP BY 1),
       |${p}u1 AS (SELECT unnest(tks) AS w FROM tr),
       |${p}c1 AS (SELECT w, count(*) AS c1 FROM ${p}u1 GROUP BY 1),
       |${p}n AS (SELECT CAST(sum(c1) AS BIGINT) AS n_train FROM ${p}c1),
       |${p}occ AS (
       |  SELECT doc_id, source,
       |         array_to_string(tks[i:i+2], ' ') AS tri,
       |         array_to_string(tks[i:i+1], ' ') AS b_ctx,
       |         array_to_string(tks[i+1:i+2], ' ') AS b_nxt,
       |         tks[i+1] AS u_ctx, tks[i+2] AS u_nxt
       |  FROM ho, unnest(range(1, len(tks) - 1)) u(i)
       |  WHERE len(tks) >= 3),
       |${p}sc AS (
       |  SELECT o.doc_id, o.source,
       |    CASE WHEN c3.c3 IS NOT NULL THEN 3
       |         WHEN cb.c2 IS NOT NULL THEN 2
       |         WHEN un.c1 IS NOT NULL THEN 1
       |         ELSE 0 END AS ord,
       |    log10(CASE WHEN c3.c3 IS NOT NULL
       |           THEN CAST(c3.c3 AS DOUBLE) / CAST(cc.c2 AS DOUBLE)
       |         WHEN cb.c2 IS NOT NULL
       |           THEN $alpha * (CAST(cb.c2 AS DOUBLE) / CAST(uc.c1 AS DOUBLE))
       |         WHEN un.c1 IS NOT NULL
       |           THEN ($alpha * $alpha)
       |                  * (CAST(un.c1 AS DOUBLE) / CAST(n.n_train AS DOUBLE))
       |         ELSE ($alpha * $alpha) / CAST(n.n_train AS DOUBLE) END) AS score
       |  FROM ${p}occ o
       |  LEFT JOIN ${p}c3 c3 ON c3.tri = o.tri
       |  LEFT JOIN ${p}c2 cc ON cc.g2 = o.b_ctx
       |  LEFT JOIN ${p}c2 cb ON cb.g2 = o.b_nxt
       |  LEFT JOIN ${p}c1 uc ON uc.w = o.u_ctx
       |  LEFT JOIN ${p}c1 un ON un.w = o.u_nxt
       |  CROSS JOIN ${p}n n),
       |${p}doc AS (
       |  SELECT doc_id, source, count(*) AS n_occ,
       |    CAST(sum(CASE WHEN ord = 3 THEN 1 ELSE 0 END) AS BIGINT) AS n3,
       |    CAST(sum(CASE WHEN ord = 2 THEN 1 ELSE 0 END) AS BIGINT) AS n2,
       |    CAST(sum(CASE WHEN ord = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n1,
       |    CAST(sum(CASE WHEN ord = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n0,
       |    ${O.davg("score")} AS doc_log10
       |  FROM ${p}sc GROUP BY 1, 2)""".stripMargin
  }

  def backoffLmScoreSql(trainPct: Int = 80, alpha: Double = 0.4): String = {
    val O = graft.functions.ExactAgg.Sql
    s"""WITH ${splitCtes(trainPct)},
       |${backoffDocCtes(alpha, "")}
       |SELECT source, count(*) AS n_docs,
       |  CAST(sum(n_occ) AS BIGINT) AS n_occ,
       |  CAST(sum(n3) AS BIGINT) AS n_trigram,
       |  CAST(sum(n2) AS BIGINT) AS n_bigram,
       |  CAST(sum(n1) AS BIGINT) AS n_unigram,
       |  CAST(sum(n0) AS BIGINT) AS n_oov,
       |  ${O.davg("doc_log10")} AS avg_doc_log10
       |FROM doc GROUP BY 1 ORDER BY 1""".stripMargin
  }

  // ── q248: interpolated Kneser–Ney held-out scoring ────────────────────

  /** The trained KN bigram model: count/type tables — PERSISTED catalog
    * artifacts keyed by (corpus, trainPct), the [[writeNextTokenIndex]] /
    * [[graft.sources.ArtifactTables]] economics: built once per corpus
    * snapshot, read by every consumer (q248, q253, q255, the streaming
    * [[graft.streaming.LmScorer]]) across invocations AND across JVMs —
    * plus the driver-scalar totals every score needs, read back from the
    * 1-row `_meta` table so serving never re-touches the corpus.
    * `denomTot` = N₁₊(··) + U where U = |train unigram types| + 1 — the
    * add-one continuation floor's denominator (see [[knModel]]). */
  final case class KnModel(c2: DataFrame, left: DataFrame, n1p: DataFrame,
                           nTypes: Long, denomTot: Long)

  /** Build the interpolated-KN bigram model from the train split (the
    * deterministic [[Sampling.hashBucket]] `< trainPct` membership — the
    * q48/q246 split discipline). Tables:
    *   - c2(bigram → count), with v/w split out,
    *   - left(v → c(v·), N₁₊(v·)),
    *   - n1p(w → N₁₊(·w)),
    * plus nTypes = N₁₊(··) and U = |train unigram types| + 1. q197's raw
    * continuation probability N₁₊(·w)/N₁₊(··) is smoothed here to
    * (N₁₊(·w)+1)/(N₁₊(··)+U) — an add-one floor over the open vocabulary,
    * so held-out tokens the train split has NEVER seen still get positive
    * mass (without it an OOV continuation scores exactly 0 and its log
    * diverges; the +1/+U form keeps every probability an exact BIGINT
    * rational). Magnitude guards fail loudly before any product could
    * overflow int64 (the q197 contract), via bounded 1-row driver reads. */
  def knModel(t: Tables, trainPct: Int = 80): KnModel = {
    require(trainPct >= 1 && trainPct <= 99,
      s"trainPct must be in [1, 99], got $trainPct")
    import graft.sources.ArtifactTables
    val spark = t.spark
    val ident = Seq(t.dir, "kn", s"trainPct=$trainPct")
    val prefix = s"graft_kn_${ArtifactTables.tag(ident: _*)}"
    val names = Seq(s"${prefix}_c2", s"${prefix}_left", s"${prefix}_n1p",
      s"${prefix}_meta")
    ArtifactTables.ensure(spark, prefix, names, ident.mkString("|")) {
      val train = t.documents
        .select(col("doc_id"), col("text"))
        .where(Sampling.hashBucket(col("doc_id")) < trainPct)
      // the base count table — one corpus pass; derived tables and the
      // magnitude guards read it BACK from the catalog, never the corpus
      gramExplode(train, 2, "bigram", minTokens = 2)
        .groupBy("bigram").agg(count(lit(1)).as("c2"))
        .select(col("bigram"), col("c2"),
          substring_index(col("bigram"), " ", 1).as("v"),
          substring_index(col("bigram"), " ", -1).as("w"))
        .write.format("parquet").option("compression", "zstd")
        .bucketBy(8, "bigram").saveAsTable(names.head)
      val c2 = spark.table(names.head)
      c2.groupBy("v")
        .agg(sum("c2").as("c_left"), count(lit(1)).as("n1f"))
        .write.format("parquet").option("compression", "zstd")
        .bucketBy(8, "v").saveAsTable(names(1))
      c2.groupBy("w").agg(count(lit(1)).as("n1p"))
        .write.format("parquet").option("compression", "zstd")
        .bucketBy(8, "w").saveAsTable(names(2))
      val mrow = c2.agg(count(lit(1)).as("ntypes"),
        coalesce(max("c2"), lit(0L)).as("maxc2")).head()
      val (nTypes, maxC2) = (mrow.getLong(0), mrow.getLong(1))
      require(nTypes > 0,
        "train split has no bigram evidence — nothing to score against")
      val uTypes = train
        .select(explode(TextAnalysis.tokens(col("text"))).as("tok"))
        .agg(countDistinct(col("tok")).as("u")).head().getLong(0)
      val denomTot = nTypes + uTypes + 1
      val maxCLeft = spark.table(names(1))
        .agg(max("c_left")).head().getLong(0)
      require(4L * maxC2 <= Long.MaxValue / denomTot &&
        4L * maxCLeft <= Long.MaxValue / denomTot &&
        3L * nTypes <= Long.MaxValue / (nTypes + 1),
        s"knModel: counts ($maxC2/$maxCLeft bigrams, $nTypes types) would " +
          "overflow the BIGINT rational; shard the model")
      // the driver scalars, persisted so a serving JVM reads 1 row
      spark.range(1)
        .select(lit(nTypes).as("ntypes"), lit(denomTot).as("denom_tot"))
        .write.format("parquet").option("compression", "zstd")
        .saveAsTable(names(3))
    }
    val meta = spark.table(names(3)).head()
    KnModel(spark.table(names.head).select("bigram", "c2"),
      spark.table(names(1)), spark.table(names(2)),
      meta.getAs[Long]("ntypes"), meta.getAs[Long]("denom_tot"))
  }

  /** Per-document interpolated-KN log-scores for ANY docs frame (doc_id,
    * source, text) — the scorer shared verbatim by the batch q248 rollup
    * and the streaming twin ([[graft.streaming.LmScorer]]), so the
    * streaming≡batch proof is by construction plus a spec.
    *
    * Per adjacent token pair (v, w), with D = 3/4 and T = denomTot:
    *
    *   context seen (c(v·) > 0, "n_kn"):
    *     P = (max(4·c(vw)−3, 0)·T + 3·N₁₊(v·)·(N₁₊(·w)+1)) / (4·c(v·)·T)
    *     — KN's discounted MLE + backoff-mass × smoothed continuation,
    *     multiplied through by 4T into one exact BIGINT rational
    *     (provably ≤ 1: the discount mass exactly covers the
    *     continuation spread);
    *   context unseen, w a known continuation ("n_cont"):
    *     P = (N₁₊(·w)+1) / T;
    *   both unseen ("n_oov"): P = 1 / T — the add-one floor.
    *
    * The score is log₁₀ P (the q246 convention); per doc the mean
    * log-score over transitions via the order-stable [[graft.functions
    * .ExactAgg]] kernels. Scoring is per DISTINCT bigram type then one
    * fan-out join — the q246 scale shape: everything corpus-linear,
    * every join an equi-join on the bigram/word key. */
  def knDocScores(docs: DataFrame, m: KnModel): DataFrame = {
    val E = graft.functions.ExactAgg
    val occ = gramExplode(docs, 2, "bigram", minTokens = 2, "doc_id", "source")
    val types = occ.select("bigram").distinct()
      .withColumn("v", substring_index(col("bigram"), " ", 1))
      .withColumn("w", substring_index(col("bigram"), " ", -1))
    val tot = lit(m.denomTot)
    val scored = types
      .join(m.c2, Seq("bigram"), "left")
      .join(m.left, Seq("v"), "left")
      .join(m.n1p, Seq("w"), "left")
      .withColumn("ord",
        when(col("c_left").isNotNull, lit(2))
          .when(col("n1p").isNotNull, lit(1))
          .otherwise(lit(0)))
      .withColumn("score", log10(
        when(col("c_left").isNotNull,
          (greatest(coalesce(col("c2"), lit(0L)) * 4 - 3, lit(0L)) * tot +
            lit(3L) * col("n1f") * (coalesce(col("n1p"), lit(0L)) + 1))
            .cast("double") /
            (lit(4L) * col("c_left") * tot).cast("double"))
          .otherwise((coalesce(col("n1p"), lit(0L)) + 1).cast("double") /
            tot.cast("double"))))
      .select("bigram", "ord", "score")
    occ.join(scored, Seq("bigram"))
      .groupBy("doc_id", "source")
      .agg(
        count(lit(1)).as("n_trans"),
        sum(when(col("ord") === 2, 1L).otherwise(0L)).as("n_kn"),
        sum(when(col("ord") === 1, 1L).otherwise(0L)).as("n_cont"),
        sum(when(col("ord") === 0, 1L).otherwise(0L)).as("n_oov"),
        E.davg(col("score")).as("doc_log10"))
  }

  /** q248: interpolated Kneser–Ney held-out scoring — the close of the
    * LM-quality loop q197 (KN model) and q246 (Stupid Backoff) opened:
    * train the KN bigram model on the deterministic train split, score
    * every held-out document ([[knDocScores]]), and report per source how
    * transitions resolved (full KN / continuation-only / OOV floor — the
    * distribution-shift cross-tab) and the mean per-doc log₁₀ score (the
    * CCNet-style quality statistic, higher = better modeled by train).
    * Reference anchor: the reference aggregates fact rows per dimension
    * the same way (airflow/dags/spark_jobs/comprehensive_analytics.py);
    * the LM scorer is the beyond-reference LLM-pipeline form. */
  def knHeldOutScore(t: Tables, trainPct: Int = 80): DataFrame = {
    val E = graft.functions.ExactAgg
    val m = knModel(t, trainPct)
    val held = t.documents
      .select(col("doc_id"), col("source"), col("text"))
      .where(Sampling.hashBucket(col("doc_id")) >= trainPct)
    knDocScores(held, m)
      .groupBy("source")
      .agg(
        count(lit(1)).as("n_docs"),
        sum("n_trans").as("n_trans"),
        sum("n_kn").as("n_kn"),
        sum("n_cont").as("n_cont"),
        sum("n_oov").as("n_oov"),
        E.davg(col("doc_log10")).as("avg_doc_log10"))
      .orderBy("source")
  }

  /** DuckDB twin of [[knHeldOutScore]]: same split hash, same train count
    * tables, T computed in-SQL from the same counts, the same one-rational
    * CASE with the identical chain of double ops, log10, and the davg
    * mirrors at both aggregation levels. Scoring runs per occurrence (the
    * engine scores per type then fans out — same values, score is a
    * function of the bigram alone). */
  /** The per-doc interpolated-KN CTE chain ending at `${p}doc` — the
    * [[backoffDocCtes]] prefix convention; with p = "" exactly the q248
    * oracle's chain. */
  private def knDocCtes(p: String): String = {
    val O = graft.functions.ExactAgg.Sql
    s"""${p}c2 AS (
       |  SELECT array_to_string(tks[i:i+1], ' ') AS bigram, count(*) AS c2
       |  FROM tr, unnest(range(1, len(tks))) u(i)
       |  WHERE len(tks) >= 2 GROUP BY 1),
       |${p}c2s AS (
       |  SELECT bigram, c2,
       |    string_split(bigram, ' ')[1] AS v,
       |    string_split(bigram, ' ')[-1] AS w
       |  FROM ${p}c2),
       |${p}lf AS (
       |  SELECT v, CAST(sum(c2) AS BIGINT) AS c_left, count(*) AS n1f
       |  FROM ${p}c2s GROUP BY 1),
       |${p}np AS (SELECT w, count(*) AS n1p FROM ${p}c2s GROUP BY 1),
       |${p}tt AS (
       |  SELECT (SELECT count(*) FROM ${p}c2s)
       |       + (SELECT count(DISTINCT u.tok)
       |          FROM (SELECT unnest(tks) AS tok FROM tr) u) + 1 AS t),
       |${p}occ AS (
       |  SELECT doc_id, source,
       |         array_to_string(tks[i:i+1], ' ') AS bigram,
       |         tks[i] AS v, tks[i+1] AS w
       |  FROM ho, unnest(range(1, len(tks))) u(i)
       |  WHERE len(tks) >= 2),
       |${p}sc AS (
       |  SELECT o.doc_id, o.source,
       |    CASE WHEN lf.c_left IS NOT NULL THEN 2
       |         WHEN np.n1p IS NOT NULL THEN 1
       |         ELSE 0 END AS ord,
       |    log10(CASE WHEN lf.c_left IS NOT NULL THEN
       |        CAST(greatest(COALESCE(cb.c2, 0) * 4 - 3, 0) * tt.t
       |             + 3 * lf.n1f * (COALESCE(np.n1p, 0) + 1) AS DOUBLE)
       |        / CAST(4 * lf.c_left * tt.t AS DOUBLE)
       |      ELSE CAST(COALESCE(np.n1p, 0) + 1 AS DOUBLE)
       |           / CAST(tt.t AS DOUBLE) END) AS score
       |  FROM ${p}occ o
       |  LEFT JOIN ${p}c2s cb ON cb.bigram = o.bigram
       |  LEFT JOIN ${p}lf lf ON lf.v = o.v
       |  LEFT JOIN ${p}np np ON np.w = o.w
       |  CROSS JOIN ${p}tt tt),
       |${p}doc AS (
       |  SELECT doc_id, source, count(*) AS n_trans,
       |    CAST(sum(CASE WHEN ord = 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_kn,
       |    CAST(sum(CASE WHEN ord = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_cont,
       |    CAST(sum(CASE WHEN ord = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_oov,
       |    ${O.davg("score")} AS doc_log10
       |  FROM ${p}sc GROUP BY 1, 2)""".stripMargin
  }

  def knHeldOutScoreSql(trainPct: Int = 80): String = {
    val O = graft.functions.ExactAgg.Sql
    s"""WITH ${splitCtes(trainPct)},
       |${knDocCtes("")}
       |SELECT source, count(*) AS n_docs,
       |  CAST(sum(n_trans) AS BIGINT) AS n_trans,
       |  CAST(sum(n_kn) AS BIGINT) AS n_kn,
       |  CAST(sum(n_cont) AS BIGINT) AS n_cont,
       |  CAST(sum(n_oov) AS BIGINT) AS n_oov,
       |  ${O.davg("doc_log10")} AS avg_doc_log10
       |FROM doc GROUP BY 1 ORDER BY 1""".stripMargin
  }

  // ── q251: trigram MODIFIED Kneser–Ney held-out scoring ────────────────

  /** The trained trigram modified-KN model (Chen & Goodman 1999, "An
    * empirical study of smoothing techniques for language modeling" §3 —
    * the production n-gram quality-filter smoothing): count/type tables —
    * PERSISTED catalog artifacts keyed by (corpus, trainPct), the
    * [[graft.sources.ArtifactTables]] economics shared with [[knModel]]:
    * built once per corpus snapshot, read by q251/q255 and any serving
    * JVM — plus the SIX count-of-count-estimated discounts and the
    * unigram-floor denominator as driver scalars read back from the
    * 1-row `_meta` table. Tables:
    *   - c3(trigram → count) with its context ("u v") and backoff bigram
    *     ("v w") split out — the [[writeNextTokenIndex]] (context, next,
    *     cnt) artifact shape, keyed by the full gram string; at 100 TB
    *     these ARE the persisted q239 index tables,
    *   - ctx3(ctx → Σc, and the count-class type counts N₁/N₂/N₃₊(uv·)
    *     the γ backoff mass reads),
    *   - cc2(bg → N₁₊(·vw)) — the CONTINUATION bigram counts modified KN
    *     backs off to (how many distinct u precede "v w"), derived from
    *     the trigram table, never raw bigram frequency,
    *   - ctx2(v → Σ over w, and its count-class type counts),
    *   - cu(w → N₁₊ of "· w" in the continuation table).
    * Discounts per order k and count class c ∈ {1, 2, 3+}:
    *   Y = n₁/(n₁+2n₂), D₁ = 1−2Y·n₂/n₁, D₂ = 2−3Y·n₃/n₂,
    *   D₃₊ = 3−4Y·n₄/n₃ (n_c = # types with count exactly c — bounded
    * 1-row driver reads). D₂/D₃₊ are floored at 0.1: the estimator can go
    * negative on skewed count-of-count profiles, and a zero discount on
    * the only populated class would zero the backoff mass γ and send an
    * unseen continuation to log(0) — the floor keeps every branch's
    * probability strictly positive while leaving natural-corpus discounts
    * untouched. An order whose classes 1..3 are not all populated cannot
    * estimate at all and falls back to the fixed D = 3/4 for every class
    * (the q248/SRILM pragma); D₁ ∈ (0,1) by construction when estimated.
    *
    * Magnitudes: unlike the bigram-KN one-rational form (q248), the
    * three-level interpolation's exact-rational denominator is
    * ctot·Q₃·cc2tot·Q₂·T with Q_k = (n₁+2n₂)·n₂·n₃ per order — past
    * int64 at any real corpus size — so scoring runs the q246 discipline
    * instead: counts stay BIGINT to the last step, probabilities are a
    * FIXED chain of IEEE double ops replayed operation-for-operation by
    * the DuckDB twin, and the 1e-6 log-domain quantization of
    * [[graft.functions.ExactAgg.davg]] absorbs the final log₁₀ ulp. */
  final case class MknModel(c3: DataFrame, ctx3: DataFrame, cc2: DataFrame,
                            ctx2: DataFrame, cu: DataFrame,
                            d13: Double, d23: Double, d33: Double,
                            d12: Double, d22: Double, d32: Double,
                            tBig: Long)

  /** The FIXED Chen–Goodman discount chain shared by [[mknModel]] and
    * [[mkn4Model]] (mirrored literally by the SQL twins). An order whose
    * count-of-count classes 1..3 are not all populated cannot estimate
    * (Y or a divisor degenerates) — it falls back to the fixed D = 3/4
    * for every class, the q248/SRILM pragma (kndiscount → cndiscount
    * when counts-of-counts are unusable). Per ORDER, not per corpus: a
    * dense synthetic corpus can have a healthy trigram profile and a
    * degenerate continuation profile at the same time. D₂/D₃₊ floored at
    * 0.1 (see [[MknModel]] scaladoc). */
  private def mknDiscounts(n1: Long, n2: Long, n3: Long,
                           n4: Long): (Double, Double, Double) =
    if (n1 > 0 && n2 > 0 && n3 > 0) {
      val y = n1.toDouble / (n1.toDouble + 2.0 * n2.toDouble)
      val d1 = 1.0 - 2.0 * y * n2.toDouble / n1.toDouble
      val d2 = math.max(2.0 - 3.0 * y * n3.toDouble / n2.toDouble, 0.1)
      val d3 = math.max(3.0 - 4.0 * y * n4.toDouble / n3.toDouble, 0.1)
      (d1, d2, d3)
    } else (0.75, 0.75, 0.75)

  def mknModel(t: Tables, trainPct: Int = 80): MknModel = {
    require(trainPct >= 1 && trainPct <= 99,
      s"trainPct must be in [1, 99], got $trainPct")
    import graft.sources.ArtifactTables
    val spark = t.spark
    val ident = Seq(t.dir, "mkn", s"trainPct=$trainPct")
    val prefix = s"graft_mkn_${ArtifactTables.tag(ident: _*)}"
    val names = Seq(s"${prefix}_c3", s"${prefix}_ctx3", s"${prefix}_cc2",
      s"${prefix}_ctx2", s"${prefix}_cu", s"${prefix}_meta")
    ArtifactTables.ensure(spark, prefix, names, ident.mkString("|")) {
      mknBuild(t, trainPct, names)
    }
    val meta = spark.table(names(5)).head()
    MknModel(spark.table(names.head).select("tri", "c3"),
      spark.table(names(1)), spark.table(names(2)),
      spark.table(names(3)), spark.table(names(4)),
      meta.getAs[Double]("d13"), meta.getAs[Double]("d23"),
      meta.getAs[Double]("d33"), meta.getAs[Double]("d12"),
      meta.getAs[Double]("d22"), meta.getAs[Double]("d32"),
      meta.getAs[Long]("t_big"))
  }

  /** The build side of [[mknModel]]: one corpus pass writes the trigram
    * table; every derived table and count-of-count scalar reads it BACK
    * from the catalog. The discounts land in the 1-row `_meta` table so a
    * serving JVM reconstructs the model with bounded reads. */
  private def mknBuild(t: Tables, trainPct: Int, names: Seq[String]): Unit = {
    val spark = t.spark
    val train = t.documents
      .select(col("doc_id"), col("text"))
      .where(Sampling.hashBucket(col("doc_id")) < trainPct)
    gramExplode(train, 3, "tri", minTokens = 3)
      .groupBy("tri").agg(count(lit(1)).as("c3"))
      .withColumn("ctx", substring_index(col("tri"), " ", 2))
      .withColumn("bg", substring_index(col("tri"), " ", -2))
      .write.format("parquet").option("compression", "zstd")
      .bucketBy(8, "tri").saveAsTable(names.head)
    val c3 = spark.table(names.head)
    c3.groupBy("ctx").agg(
      sum("c3").as("c3tot"),
      sum(when(col("c3") === 1, 1L).otherwise(0L)).as("f1"),
      sum(when(col("c3") === 2, 1L).otherwise(0L)).as("f2"),
      sum(when(col("c3") >= 3, 1L).otherwise(0L)).as("f3p"))
      .write.format("parquet").option("compression", "zstd")
      .bucketBy(8, "ctx").saveAsTable(names(1))
    c3.groupBy("bg").agg(count(lit(1)).as("cc2"))
      .write.format("parquet").option("compression", "zstd")
      .bucketBy(8, "bg").saveAsTable(names(2))
    val cc2 = spark.table(names(2))
    cc2.groupBy(substring_index(col("bg"), " ", 1).as("v")).agg(
      sum("cc2").as("cc2tot"),
      sum(when(col("cc2") === 1, 1L).otherwise(0L)).as("h1"),
      sum(when(col("cc2") === 2, 1L).otherwise(0L)).as("h2"),
      sum(when(col("cc2") >= 3, 1L).otherwise(0L)).as("h3p"))
      .write.format("parquet").option("compression", "zstd")
      .bucketBy(8, "v").saveAsTable(names(3))
    cc2.groupBy(substring_index(col("bg"), " ", -1).as("w"))
      .agg(count(lit(1)).as("cu"))
      .write.format("parquet").option("compression", "zstd")
      .bucketBy(8, "w").saveAsTable(names(4))
    // count-of-count scalars, one bounded driver row per order
    val r3 = c3.agg(
      coalesce(sum(when(col("c3") === 1, 1L).otherwise(0L)), lit(0L)).as("n1"),
      coalesce(sum(when(col("c3") === 2, 1L).otherwise(0L)), lit(0L)).as("n2"),
      coalesce(sum(when(col("c3") === 3, 1L).otherwise(0L)), lit(0L)).as("n3"),
      coalesce(sum(when(col("c3") === 4, 1L).otherwise(0L)), lit(0L)).as("n4"),
      count(lit(1)).as("ntypes")).head()
    val r2 = cc2.agg(
      coalesce(sum(when(col("cc2") === 1, 1L).otherwise(0L)), lit(0L)).as("n1"),
      coalesce(sum(when(col("cc2") === 2, 1L).otherwise(0L)), lit(0L)).as("n2"),
      coalesce(sum(when(col("cc2") === 3, 1L).otherwise(0L)), lit(0L)).as("n3"),
      coalesce(sum(when(col("cc2") === 4, 1L).otherwise(0L)), lit(0L)).as("n4"),
      count(lit(1)).as("ntypes")).head()
    require(r3.getLong(4) > 0,
      "train split has no trigram evidence — nothing to score against")
    val (d13, d23, d33) = mknDiscounts(r3.getLong(0), r3.getLong(1), r3.getLong(2), r3.getLong(3))
    val (d12, d22, d32) = mknDiscounts(r2.getLong(0), r2.getLong(1), r2.getLong(2), r2.getLong(3))
    val uTypes = train
      .select(explode(TextAnalysis.tokens(col("text"))).as("tok"))
      .agg(countDistinct(col("tok")).as("u")).head().getLong(0)
    val tBig = r2.getLong(4) + uTypes + 1
    spark.range(1).select(
      lit(d13).as("d13"), lit(d23).as("d23"), lit(d33).as("d33"),
      lit(d12).as("d12"), lit(d22).as("d22"), lit(d32).as("d32"),
      lit(tBig).as("t_big"))
      .write.format("parquet").option("compression", "zstd")
      .saveAsTable(names(5))
  }

  /** Per-document trigram modified-KN log-scores for ANY docs frame
    * (doc_id, source, text). Per trigram occurrence (u, v, w):
    *
    *   context "u v" seen (ord 3):
    *     P = (c(uvw) − D₃(c))⁺/c(uv·) + γ₃(uv)·P₂
    *     γ₃(uv) = (D₁·N₁(uv·) + D₂·N₂(uv·) + D₃₊·N₃₊(uv·)) / c(uv·)
    *   backoff (continuation counts): "v" seen as a continuation context
    *     (ord 2): P₂ = (N₁₊(·vw) − D₂(·))⁺/N₁₊(·v·) + γ₂(v)·P₁
    *   unigram continuation floor (the q248 add-one open-vocabulary
    *     smoothing): P₁ = (N₁₊(·w)+1)/T, T = |continuation types| + U;
    *     ord 1 if w is a known continuation, else ord 0 (OOV).
    *
    * Every branch's probability is strictly positive (the discount floor
    * keeps γ > 0; P₁ ≥ 1/T), and with consistent discounts Σ_w P ≤ 1.
    * Scoring per DISTINCT trigram type then one fan-out join — the
    * q246/q248 scale shape: corpus-linear, all equi-joins. */
  def mknDocScores(docs: DataFrame, m: MknModel): DataFrame = {
    val E = graft.functions.ExactAgg
    val occ = gramExplode(docs, 3, "tri", minTokens = 3, "doc_id", "source")
    val types = occ.select("tri").distinct()
      .withColumn("ctx", substring_index(col("tri"), " ", 2))
      .withColumn("bg", substring_index(col("tri"), " ", -2))
      .withColumn("v", substring_index(col("bg"), " ", 1))
      .withColumn("w", substring_index(col("bg"), " ", -1))
    val tD = lit(m.tBig).cast("double")
    val scored = types
      .join(m.c3, Seq("tri"), "left")
      .join(m.ctx3, Seq("ctx"), "left")
      .join(m.cc2, Seq("bg"), "left")
      .join(m.ctx2, Seq("v"), "left")
      .join(m.cu, Seq("w"), "left")
      .withColumn("p1",
        (coalesce(col("cu"), lit(0L)) + 1).cast("double") / tD)
      .withColumn("p2",
        when(col("cc2tot").isNotNull,
          greatest(coalesce(col("cc2"), lit(0L)).cast("double") -
            when(coalesce(col("cc2"), lit(0L)) === 0, lit(0.0))
              .when(col("cc2") === 1, lit(m.d12))
              .when(col("cc2") === 2, lit(m.d22))
              .otherwise(lit(m.d32)), lit(0.0)) /
            col("cc2tot").cast("double") +
            ((lit(m.d12) * col("h1").cast("double") +
              lit(m.d22) * col("h2").cast("double") +
              lit(m.d32) * col("h3p").cast("double")) /
              col("cc2tot").cast("double")) * col("p1"))
          .otherwise(col("p1")))
      .withColumn("p3",
        when(col("c3tot").isNotNull,
          greatest(coalesce(col("c3"), lit(0L)).cast("double") -
            when(coalesce(col("c3"), lit(0L)) === 0, lit(0.0))
              .when(col("c3") === 1, lit(m.d13))
              .when(col("c3") === 2, lit(m.d23))
              .otherwise(lit(m.d33)), lit(0.0)) /
            col("c3tot").cast("double") +
            ((lit(m.d13) * col("f1").cast("double") +
              lit(m.d23) * col("f2").cast("double") +
              lit(m.d33) * col("f3p").cast("double")) /
              col("c3tot").cast("double")) * col("p2"))
          .otherwise(col("p2")))
      .withColumn("ord",
        when(col("c3tot").isNotNull, lit(3))
          .when(col("cc2tot").isNotNull, lit(2))
          .when(col("cu").isNotNull, lit(1))
          .otherwise(lit(0)))
      .withColumn("score", log10(col("p3")))
      .select("tri", "ord", "score")
    occ.join(scored, Seq("tri"))
      .groupBy("doc_id", "source")
      .agg(
        count(lit(1)).as("n_trans"),
        sum(when(col("ord") === 3, 1L).otherwise(0L)).as("n_mkn"),
        sum(when(col("ord") === 2, 1L).otherwise(0L)).as("n_big"),
        sum(when(col("ord") === 1, 1L).otherwise(0L)).as("n_cont"),
        sum(when(col("ord") === 0, 1L).otherwise(0L)).as("n_oov"),
        E.davg(col("score")).as("doc_log10"))
  }

  /** q251: trigram modified-Kneser–Ney held-out scoring — the production
    * LM-quality filter the q248 bigram model approximates: discounts
    * estimated from the train split's count-of-counts (not fixed), the
    * middle order backed off through CONTINUATION counts, and the same
    * per-source report shape (order-resolution cross-tab + mean per-doc
    * log₁₀ score). Closes the LM loop q197 → q246 → q248 opened at the
    * model the CCNet/KenLM pipelines actually run. */
  def mknHeldOutScore(t: Tables, trainPct: Int = 80): DataFrame = {
    val E = graft.functions.ExactAgg
    val m = mknModel(t, trainPct)
    val held = t.documents
      .select(col("doc_id"), col("source"), col("text"))
      .where(Sampling.hashBucket(col("doc_id")) >= trainPct)
    mknDocScores(held, m)
      .groupBy("source")
      .agg(
        count(lit(1)).as("n_docs"),
        sum("n_trans").as("n_trans"),
        sum("n_mkn").as("n_mkn"),
        sum("n_big").as("n_big"),
        sum("n_cont").as("n_cont"),
        sum("n_oov").as("n_oov"),
        E.davg(col("doc_log10")).as("avg_doc_log10"))
      .orderBy("source")
  }

  // ── q258: 4-gram modified Kneser–Ney held-out scoring ────────────────

  /** The trained 4-gram modified-KN model — [[MknModel]]'s machinery
    * extended one order (Chen & Goodman 1999 §3; the per-order
    * count-of-count discount estimation and the continuation-count
    * backoff recursion apply verbatim at every order). Tables (all
    * PERSISTED catalog artifacts keyed by (corpus, trainPct), the
    * [[graft.sources.ArtifactTables]] economics — the 4-gram tables are
    * born persisted, per the r10 roadmap sequencing):
    *   - c4(quad → count) with its context ("u v w") and backoff trigram
    *     ("v w x") split out,
    *   - ctx4(ctx → Σc₄ and count-class type counts N₁/N₂/N₃₊(uvw·)),
    *   - cc3(tg → N₁₊(·vwx)) — CONTINUATION trigram counts (how many
    *     distinct u precede "v w x"), derived from the 4-gram table with
    *     its own context/backoff splits,
    *   - ctx3c(ctx3 → Σ and count classes over cc3),
    *   - cc2(bg → continuation bigram counts derived from cc3 — the
    *     recursive adjusted-count convention q251 established: each
    *     lower order counts distinct predecessors in the next-higher
    *     CONTINUATION table),
    *   - ctx2c(v → Σ and count classes over cc2), cu(w → N₁₊ of "· w").
    * Nine discounts (three per estimated order, [[mknDiscounts]] — the
    * same fixed IEEE chain and degenerate-profile D = ¾ fallback) and
    * the unigram-floor denominator T land in the 1-row `_meta` table. */
  final case class Mkn4Model(c4: DataFrame, ctx4: DataFrame,
                             cc3: DataFrame, ctx3c: DataFrame,
                             cc2: DataFrame, ctx2c: DataFrame,
                             cu: DataFrame,
                             d14: Double, d24: Double, d34: Double,
                             d13: Double, d23: Double, d33: Double,
                             d12: Double, d22: Double, d32: Double,
                             tBig: Long)

  def mkn4Model(t: Tables, trainPct: Int = 80): Mkn4Model = {
    require(trainPct >= 1 && trainPct <= 99,
      s"trainPct must be in [1, 99], got $trainPct")
    import graft.sources.ArtifactTables
    val spark = t.spark
    val ident = Seq(t.dir, "mkn4", s"trainPct=$trainPct")
    val prefix = s"graft_mkn4_${ArtifactTables.tag(ident: _*)}"
    val names = Seq(s"${prefix}_c4", s"${prefix}_ctx4", s"${prefix}_cc3",
      s"${prefix}_ctx3c", s"${prefix}_cc2", s"${prefix}_ctx2c",
      s"${prefix}_cu", s"${prefix}_meta")
    ArtifactTables.ensure(spark, prefix, names, ident.mkString("|")) {
      mkn4Build(t, trainPct, names)
    }
    val meta = spark.table(names(7)).head()
    Mkn4Model(spark.table(names.head).select("quad", "c4"),
      spark.table(names(1)), spark.table(names(2)).select("tg", "cc3"),
      spark.table(names(3)), spark.table(names(4)),
      spark.table(names(5)), spark.table(names(6)),
      meta.getAs[Double]("d14"), meta.getAs[Double]("d24"),
      meta.getAs[Double]("d34"), meta.getAs[Double]("d13"),
      meta.getAs[Double]("d23"), meta.getAs[Double]("d33"),
      meta.getAs[Double]("d12"), meta.getAs[Double]("d22"),
      meta.getAs[Double]("d32"), meta.getAs[Long]("t_big"))
  }

  /** The build side of [[mkn4Model]] — the [[mknBuild]] shape one order
    * up: one corpus pass writes the 4-gram table; every derived table
    * and count-of-count scalar reads the catalog. */
  private def mkn4Build(t: Tables, trainPct: Int, names: Seq[String]): Unit = {
    val spark = t.spark
    val train = t.documents
      .select(col("doc_id"), col("text"))
      .where(Sampling.hashBucket(col("doc_id")) < trainPct)
    gramExplode(train, 4, "quad", minTokens = 4)
      .groupBy("quad").agg(count(lit(1)).as("c4"))
      .withColumn("ctx", substring_index(col("quad"), " ", 3))
      .withColumn("tg", substring_index(col("quad"), " ", -3))
      .write.format("parquet").option("compression", "zstd")
      .bucketBy(8, "quad").saveAsTable(names.head)
    val c4 = spark.table(names.head)
    c4.groupBy("ctx").agg(
      sum("c4").as("c4tot"),
      sum(when(col("c4") === 1, 1L).otherwise(0L)).as("g1"),
      sum(when(col("c4") === 2, 1L).otherwise(0L)).as("g2"),
      sum(when(col("c4") >= 3, 1L).otherwise(0L)).as("g3p"))
      .write.format("parquet").option("compression", "zstd")
      .bucketBy(8, "ctx").saveAsTable(names(1))
    c4.groupBy("tg").agg(count(lit(1)).as("cc3"))
      .withColumn("ctx3", substring_index(col("tg"), " ", 2))
      .withColumn("bg", substring_index(col("tg"), " ", -2))
      .write.format("parquet").option("compression", "zstd")
      .bucketBy(8, "tg").saveAsTable(names(2))
    val cc3 = spark.table(names(2))
    cc3.groupBy("ctx3").agg(
      sum("cc3").as("cc3tot"),
      sum(when(col("cc3") === 1, 1L).otherwise(0L)).as("f1"),
      sum(when(col("cc3") === 2, 1L).otherwise(0L)).as("f2"),
      sum(when(col("cc3") >= 3, 1L).otherwise(0L)).as("f3p"))
      .write.format("parquet").option("compression", "zstd")
      .bucketBy(8, "ctx3").saveAsTable(names(3))
    cc3.groupBy("bg").agg(count(lit(1)).as("cc2"))
      .write.format("parquet").option("compression", "zstd")
      .bucketBy(8, "bg").saveAsTable(names(4))
    val cc2 = spark.table(names(4))
    cc2.groupBy(substring_index(col("bg"), " ", 1).as("v")).agg(
      sum("cc2").as("cc2tot"),
      sum(when(col("cc2") === 1, 1L).otherwise(0L)).as("h1"),
      sum(when(col("cc2") === 2, 1L).otherwise(0L)).as("h2"),
      sum(when(col("cc2") >= 3, 1L).otherwise(0L)).as("h3p"))
      .write.format("parquet").option("compression", "zstd")
      .bucketBy(8, "v").saveAsTable(names(5))
    cc2.groupBy(substring_index(col("bg"), " ", -1).as("w"))
      .agg(count(lit(1)).as("cu"))
      .write.format("parquet").option("compression", "zstd")
      .bucketBy(8, "w").saveAsTable(names(6))
    def coc(df: DataFrame, c: String) = df.agg(
      coalesce(sum(when(col(c) === 1, 1L).otherwise(0L)), lit(0L)).as("n1"),
      coalesce(sum(when(col(c) === 2, 1L).otherwise(0L)), lit(0L)).as("n2"),
      coalesce(sum(when(col(c) === 3, 1L).otherwise(0L)), lit(0L)).as("n3"),
      coalesce(sum(when(col(c) === 4, 1L).otherwise(0L)), lit(0L)).as("n4"),
      count(lit(1)).as("ntypes")).head()
    val r4 = coc(c4, "c4")
    val r3 = coc(cc3, "cc3")
    val r2 = coc(cc2, "cc2")
    require(r4.getLong(4) > 0,
      "train split has no 4-gram evidence — nothing to score against")
    val (d14, d24, d34) = mknDiscounts(r4.getLong(0), r4.getLong(1), r4.getLong(2), r4.getLong(3))
    val (d13, d23, d33) = mknDiscounts(r3.getLong(0), r3.getLong(1), r3.getLong(2), r3.getLong(3))
    val (d12, d22, d32) = mknDiscounts(r2.getLong(0), r2.getLong(1), r2.getLong(2), r2.getLong(3))
    val uTypes = train
      .select(explode(TextAnalysis.tokens(col("text"))).as("tok"))
      .agg(countDistinct(col("tok")).as("u")).head().getLong(0)
    val tBig = r2.getLong(4) + uTypes + 1
    spark.range(1).select(
      lit(d14).as("d14"), lit(d24).as("d24"), lit(d34).as("d34"),
      lit(d13).as("d13"), lit(d23).as("d23"), lit(d33).as("d33"),
      lit(d12).as("d12"), lit(d22).as("d22"), lit(d32).as("d32"),
      lit(tBig).as("t_big"))
      .write.format("parquet").option("compression", "zstd")
      .saveAsTable(names(7))
  }

  /** Per-document 4-gram modified-KN log-scores for ANY docs frame
    * (doc_id, source, text) — [[mknDocScores]]'s recursion one order up.
    * Per 4-gram occurrence (u, v, w, x):
    *   P₁ = (N₁₊(·x)+1)/T (the open-vocabulary floor),
    *   P₂ = (N₁₊(·wx) − D₂)⁺/N₁₊(·w·) + γ₂(w)·P₁ when "w" is a seen
    *        continuation context, else P₁,
    *   P₃ = (N₁₊(·vwx) − D₃)⁺/N₁₊(·vw·) + γ₃(vw)·P₂ when "v w" is seen,
    *        else P₂,
    *   P₄ = (c(uvwx) − D₄)⁺/c(uvw·) + γ₄(uvw)·P₃ when "u v w" is seen,
    *        else P₃;
    * ord records the deepest seen level (4/3/2/1/0). Scoring per
    * DISTINCT 4-gram type then one fan-out join — the q246/q248/q251
    * scale shape: corpus-linear, all equi-joins against persisted
    * bucketed tables. */
  def mkn4DocScores(docs: DataFrame, m: Mkn4Model): DataFrame = {
    val E = graft.functions.ExactAgg
    val occ = gramExplode(docs, 4, "quad", minTokens = 4, "doc_id", "source")
    val types = occ.select("quad").distinct()
      .withColumn("ctx", substring_index(col("quad"), " ", 3))
      .withColumn("tg", substring_index(col("quad"), " ", -3))
      .withColumn("ctx3", substring_index(col("tg"), " ", 2))
      .withColumn("bg", substring_index(col("tg"), " ", -2))
      .withColumn("v", substring_index(col("bg"), " ", 1))
      .withColumn("w", substring_index(col("bg"), " ", -1))
    val tD = lit(m.tBig).cast("double")
    val scored = types
      .join(m.c4, Seq("quad"), "left")
      .join(m.ctx4, Seq("ctx"), "left")
      .join(m.cc3, Seq("tg"), "left")
      .join(m.ctx3c, Seq("ctx3"), "left")
      .join(m.cc2, Seq("bg"), "left")
      .join(m.ctx2c, Seq("v"), "left")
      .join(m.cu, Seq("w"), "left")
      .withColumn("p1",
        (coalesce(col("cu"), lit(0L)) + 1).cast("double") / tD)
      .withColumn("p2",
        when(col("cc2tot").isNotNull,
          greatest(coalesce(col("cc2"), lit(0L)).cast("double") -
            when(coalesce(col("cc2"), lit(0L)) === 0, lit(0.0))
              .when(col("cc2") === 1, lit(m.d12))
              .when(col("cc2") === 2, lit(m.d22))
              .otherwise(lit(m.d32)), lit(0.0)) /
            col("cc2tot").cast("double") +
            ((lit(m.d12) * col("h1").cast("double") +
              lit(m.d22) * col("h2").cast("double") +
              lit(m.d32) * col("h3p").cast("double")) /
              col("cc2tot").cast("double")) * col("p1"))
          .otherwise(col("p1")))
      .withColumn("p3",
        when(col("cc3tot").isNotNull,
          greatest(coalesce(col("cc3"), lit(0L)).cast("double") -
            when(coalesce(col("cc3"), lit(0L)) === 0, lit(0.0))
              .when(col("cc3") === 1, lit(m.d13))
              .when(col("cc3") === 2, lit(m.d23))
              .otherwise(lit(m.d33)), lit(0.0)) /
            col("cc3tot").cast("double") +
            ((lit(m.d13) * col("f1").cast("double") +
              lit(m.d23) * col("f2").cast("double") +
              lit(m.d33) * col("f3p").cast("double")) /
              col("cc3tot").cast("double")) * col("p2"))
          .otherwise(col("p2")))
      .withColumn("p4",
        when(col("c4tot").isNotNull,
          greatest(coalesce(col("c4"), lit(0L)).cast("double") -
            when(coalesce(col("c4"), lit(0L)) === 0, lit(0.0))
              .when(col("c4") === 1, lit(m.d14))
              .when(col("c4") === 2, lit(m.d24))
              .otherwise(lit(m.d34)), lit(0.0)) /
            col("c4tot").cast("double") +
            ((lit(m.d14) * col("g1").cast("double") +
              lit(m.d24) * col("g2").cast("double") +
              lit(m.d34) * col("g3p").cast("double")) /
              col("c4tot").cast("double")) * col("p3"))
          .otherwise(col("p3")))
      .withColumn("ord",
        when(col("c4tot").isNotNull, lit(4))
          .when(col("cc3tot").isNotNull, lit(3))
          .when(col("cc2tot").isNotNull, lit(2))
          .when(col("cu").isNotNull, lit(1))
          .otherwise(lit(0)))
      .withColumn("score", log10(col("p4")))
      .select("quad", "ord", "score")
    occ.join(scored, Seq("quad"))
      .groupBy("doc_id", "source")
      .agg(
        count(lit(1)).as("n_trans"),
        sum(when(col("ord") === 4, 1L).otherwise(0L)).as("n_mkn4"),
        sum(when(col("ord") === 3, 1L).otherwise(0L)).as("n_tri"),
        sum(when(col("ord") === 2, 1L).otherwise(0L)).as("n_big"),
        sum(when(col("ord") === 1, 1L).otherwise(0L)).as("n_cont"),
        sum(when(col("ord") === 0, 1L).otherwise(0L)).as("n_oov"),
        E.davg(col("score")).as("doc_log10"))
  }

  /** q258: 4-gram modified-Kneser–Ney held-out scoring — the q251
    * machinery extended one order (the r10 roadmap item): a longer
    * context sharpens the quality filter where 4-gram evidence exists
    * and the continuation-count backoff chain degrades gracefully where
    * it does not; the per-source order-resolution cross-tab now shows
    * how much of the held-out corpus each context depth covers. */
  def mkn4HeldOutScore(t: Tables, trainPct: Int = 80): DataFrame = {
    val E = graft.functions.ExactAgg
    val m = mkn4Model(t, trainPct)
    val held = t.documents
      .select(col("doc_id"), col("source"), col("text"))
      .where(Sampling.hashBucket(col("doc_id")) >= trainPct)
    mkn4DocScores(held, m)
      .groupBy("source")
      .agg(
        count(lit(1)).as("n_docs"),
        sum("n_trans").as("n_trans"),
        sum("n_mkn4").as("n_mkn4"),
        sum("n_tri").as("n_tri"),
        sum("n_big").as("n_big"),
        sum("n_cont").as("n_cont"),
        sum("n_oov").as("n_oov"),
        E.davg(col("doc_log10")).as("avg_doc_log10"))
      .orderBy("source")
  }

  // ── q254: next-token surprisal against the persisted index ───────────

  /** The surprisal model: the PERSISTED q244 bucketed next-token index
    * tables plus the one corpus scalar (total gram occurrences) the OOV
    * floor needs. Loading is a catalog read — the corpus is never
    * re-touched; [[writeNextTokenIndex]] runs only if the index is absent
    * (the q244 build-once contract). */
  final case class SurprisalModel(counts: DataFrame, totals: DataFrame,
                                  nTotal: Long)

  def surprisalModel(t: Tables, n: Int = 3): SurprisalModel = {
    val spark = t.spark
    val prefix = ntIndexPrefix(t, n)
    val counts = spark.table(s"${prefix}_counts")
    val totals = spark.table(s"${prefix}_totals")
    val nTotal = totals.agg(coalesce(sum("context_total"), lit(0L)).as("nt"))
      .head().getLong(0)
    require(nTotal > 0,
      s"next-token index '$prefix' is empty — nothing to score against")
    SurprisalModel(counts, totals, nTotal)
  }

  /** Per-document next-token SURPRISAL (−log₁₀ P) for ANY docs frame
    * (doc_id, source, text), scored against the persisted index — the
    * "how surprised is the corpus model by this document" signal (high
    * mean surprisal = novel or junk; near-zero = templated/duplicated).
    * Per n-gram transition:
    *   - index hit (ord 2):      P = cnt / context_total,
    *   - context only (ord 1):   P = 1 / (context_total + 1) — the
    *     add-one unseen-next floor within a seen context,
    *   - OOV context (ord 0):    P = 1 / (N + 1), N = total index grams.
    * Shared verbatim by the batch q254 rollup and the streaming twin
    * ([[graft.streaming.SurprisalScorer]]) — per-doc scores are a pure
    * function of (document, static index), so streaming ≡ batch
    * bit-for-bit by construction plus SurprisalScorerSpec's replay.
    * Scoring per DISTINCT (context, next) type then one fan-out join —
    * the q246/q248 scale shape. */
  def surprisalDocScores(docs: DataFrame, m: SurprisalModel,
                         n: Int = 3): DataFrame = {
    val E = graft.functions.ExactAgg
    val occ = gramExplode(docs, n, "gram", minTokens = n, "doc_id", "source")
      .select(col("doc_id"), col("source"),
        substring_index(col("gram"), " ", n - 1).as("context"),
        substring_index(col("gram"), " ", -1).as("next"))
    val types = occ.select("context", "next").distinct()
      .join(m.counts, Seq("context", "next"), "left")
      .join(m.totals, Seq("context"), "left")
      .withColumn("ord",
        when(col("cnt").isNotNull, lit(2))
          .when(col("context_total").isNotNull, lit(1))
          .otherwise(lit(0)))
      .withColumn("surprisal", -log10(
        when(col("cnt").isNotNull,
          col("cnt").cast("double") / col("context_total").cast("double"))
          .when(col("context_total").isNotNull,
            lit(1.0) / (col("context_total") + 1).cast("double"))
          .otherwise(lit(1.0) / lit(m.nTotal + 1).cast("double"))))
      .select("context", "next", "ord", "surprisal")
    occ.join(types, Seq("context", "next"))
      .groupBy("doc_id", "source")
      .agg(
        count(lit(1)).as("n_trans"),
        sum(when(col("ord") === 2, 1L).otherwise(0L)).as("n_hit"),
        sum(when(col("ord") === 1, 1L).otherwise(0L)).as("n_ctx"),
        sum(when(col("ord") === 0, 1L).otherwise(0L)).as("n_oov"),
        E.davg(col("surprisal")).as("doc_surprisal"))
  }

  /** q254: per-source surprisal report — every document scored against
    * the persisted next-token index ([[surprisalDocScores]]), rolled up
    * per source: transition resolution counts and the mean per-doc
    * surprisal. Counts are counts however stored, so the DuckDB twin
    * recomputes them from the raw corpus and the round-trip through the
    * bucketed index lands under the hash gate (the q244 doctrine). */
  def surprisalReport(t: Tables, n: Int = 3): DataFrame = {
    val E = graft.functions.ExactAgg
    val m = surprisalModel(t, n)
    val docs = t.documents.select(col("doc_id"), col("source"), col("text"))
    surprisalDocScores(docs, m, n)
      .groupBy("source")
      .agg(
        count(lit(1)).as("n_docs"),
        sum("n_trans").as("n_trans"),
        sum("n_hit").as("n_hit"),
        sum("n_ctx").as("n_ctx"),
        sum("n_oov").as("n_oov"),
        E.davg(col("doc_surprisal")).as("avg_doc_surprisal"))
      .orderBy("source")
  }

  /** DuckDB twin of [[surprisalReport]]: index counts recomputed from the
    * raw corpus (identical by construction), the same branch CASE with
    * the identical double chain, davg at both levels. */
  def surprisalReportSql(n: Int = 3): String = {
    val O = graft.functions.ExactAgg.Sql
    s"""WITH tk AS (
       |  SELECT doc_id, source,
       |         string_split_regex(trim(text), '\\s+') AS tks
       |  FROM documents),
       |g AS (
       |  SELECT array_to_string(tks[i:i+${n - 2}], ' ') AS context,
       |         tks[i+${n - 1}] AS next
       |  FROM tk, unnest(range(1, len(tks) - ${n - 2})) u(i)
       |  WHERE len(tks) >= $n),
       |c AS (SELECT context, next, count(*) AS cnt FROM g GROUP BY 1, 2),
       |tot AS (SELECT context, CAST(sum(cnt) AS BIGINT) AS context_total
       |        FROM c GROUP BY 1),
       |nt AS (SELECT CAST(sum(cnt) AS BIGINT) AS n_total FROM c),
       |occ AS (
       |  SELECT doc_id, source,
       |         array_to_string(tks[i:i+${n - 2}], ' ') AS context,
       |         tks[i+${n - 1}] AS next
       |  FROM tk, unnest(range(1, len(tks) - ${n - 2})) u(i)
       |  WHERE len(tks) >= $n),
       |sc AS (
       |  SELECT o.doc_id, o.source,
       |    CASE WHEN c.cnt IS NOT NULL THEN 2
       |         WHEN t.context_total IS NOT NULL THEN 1
       |         ELSE 0 END AS ord,
       |    -log10(CASE WHEN c.cnt IS NOT NULL THEN
       |        CAST(c.cnt AS DOUBLE) / CAST(t.context_total AS DOUBLE)
       |      WHEN t.context_total IS NOT NULL THEN
       |        1.0 / CAST(t.context_total + 1 AS DOUBLE)
       |      ELSE 1.0 / CAST(nt.n_total + 1 AS DOUBLE) END) AS surprisal
       |  FROM occ o
       |  LEFT JOIN c ON c.context = o.context AND c.next = o.next
       |  LEFT JOIN tot t ON t.context = o.context
       |  CROSS JOIN nt),
       |doc AS (
       |  SELECT doc_id, source, count(*) AS n_trans,
       |    CAST(sum(CASE WHEN ord = 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_hit,
       |    CAST(sum(CASE WHEN ord = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_ctx,
       |    CAST(sum(CASE WHEN ord = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_oov,
       |    ${O.davg("surprisal")} AS doc_surprisal
       |  FROM sc GROUP BY 1, 2)
       |SELECT source, count(*) AS n_docs,
       |  CAST(sum(n_trans) AS BIGINT) AS n_trans,
       |  CAST(sum(n_hit) AS BIGINT) AS n_hit,
       |  CAST(sum(n_ctx) AS BIGINT) AS n_ctx,
       |  CAST(sum(n_oov) AS BIGINT) AS n_oov,
       |  ${O.davg("doc_surprisal")} AS avg_doc_surprisal
       |FROM doc GROUP BY 1 ORDER BY 1""".stripMargin
  }

  // ── q253: perplexity-calibrated quality buckets ───────────────────────

  /** q253: the CCNet head/middle/tail corpus partition (Wenzek et al.
    * 2020, "CCNet: Extracting high quality monolingual datasets from web
    * crawl data" §4.3 — the ACTUAL consumption of an LM quality score):
    * every document that survives the q71 quality funnel is scored by the
    * q248 interpolated-KN model ([[knDocScores]]), the corpus-wide tercile
    * boundaries of the per-doc mean log₁₀ score are taken as the
    * `percentile_disc` VALUES (ACTUAL data values — deterministic and
    * replayed exactly by DuckDB's quantile_disc, the q51 discipline;
    * never an interpolated midpoint) via the bounded-memory disc
    * selection ([[graft.operators.Analytics.gridQuantileDiscs]] — the
    * q107/q170 grid machinery refined to exact order statistics, O(grid)
    * counters instead of a single reducer buffering every doc score),
    * and each document lands in `head` (top third, best modeled),
    * `middle`, or `tail`. Report per (bucket, source): doc count and
    * mean score — the per-source shift view a curation run publishes
    * before choosing which buckets to train on.
    *
    * Scale shape: the funnel is a narrow scan filter, scoring is the
    * corpus-linear q248 path, the boundaries are TWO driver scalars
    * broadcast back as literals, and the roll-up is one hash aggregate —
    * nothing new shuffles beyond the scorer itself, and no stage buffers
    * more than O(grid) per task at any corpus size. */
  def perplexityBuckets(t: Tables, trainPct: Int = 80): DataFrame = {
    val E = graft.functions.ExactAgg
    val m = knModel(t, trainPct)
    val passing = t.documents
      .select(col("doc_id"), col("source"), col("text"))
      .where(TextAnalysis.qualityPass(col("text")))
    // feeds the boundary selection AND the bucket assignment — one scoring
    // pass, materialized (doc-count-sized, freed with the frame)
    val perDoc = knDocScores(passing, m)
      .select(col("doc_id"), col("source"), col("doc_log10"))
      .localCheckpoint()
    val bounds = graft.operators.Analytics.gridQuantileDiscs(
      perDoc, "doc_log10", Seq(0.3333333333333333, 0.6666666666666666))
    val (pLo, pHi) = (bounds.head, bounds(1))
    perDoc
      .withColumn("bucket",
        when(col("doc_log10") >= lit(pHi), lit("head"))
          .when(col("doc_log10") >= lit(pLo), lit("middle"))
          .otherwise(lit("tail")))
      .groupBy(col("bucket"), col("source"))
      .agg(
        count(lit(1)).as("n_docs"),
        E.davg(col("doc_log10")).as("avg_doc_log10"))
      .orderBy(col("bucket"), col("source"))
  }

  /** DuckDB twin of [[perplexityBuckets]]: the q248 scoring chain
    * restricted to funnel-passing documents (the q71 flag predicates),
    * quantile_disc boundaries, the same bucket CASE and roll-up. */
  def perplexityBucketsSql(trainPct: Int = 80): String = {
    val O = graft.functions.ExactAgg.Sql
    val h = s"((${Sampling.splitHashSql("doc_id")}) % 100)"
    val stop = TextAnalysis.stopwords.map(s => s"'$s'").mkString("[", ", ", "]")
    s"""WITH d AS (
       |  SELECT doc_id, source, text,
       |         string_split_regex(trim(text), '\\s+') AS tks,
       |         $h AS b
       |  FROM documents),
       |tr AS (SELECT * FROM d WHERE b < $trainPct),
       |pass AS (
       |  SELECT * FROM d
       |  WHERE len(tks) BETWEEN 10 AND 100000
       |    AND CAST(length(text) AS DOUBLE) / len(tks) >= 2.0e0
       |    AND CAST(length(text) AS DOUBLE) / len(tks) <= 12.0e0
       |    AND CAST(len(list_distinct(tks)) AS DOUBLE) / len(tks) >= 0.3e0
       |    AND len(list_filter(tks, tk -> list_contains($stop, tk))) >= 1),
       |c2 AS (
       |  SELECT array_to_string(tks[i:i+1], ' ') AS bigram, count(*) AS c2
       |  FROM tr, unnest(range(1, len(tks))) u(i)
       |  WHERE len(tks) >= 2 GROUP BY 1),
       |c2s AS (
       |  SELECT bigram, c2,
       |    string_split(bigram, ' ')[1] AS v,
       |    string_split(bigram, ' ')[-1] AS w
       |  FROM c2),
       |lf AS (
       |  SELECT v, CAST(sum(c2) AS BIGINT) AS c_left, count(*) AS n1f
       |  FROM c2s GROUP BY 1),
       |np AS (SELECT w, count(*) AS n1p FROM c2s GROUP BY 1),
       |tt AS (
       |  SELECT (SELECT count(*) FROM c2s)
       |       + (SELECT count(DISTINCT u.tok)
       |          FROM (SELECT unnest(tks) AS tok FROM tr) u) + 1 AS t),
       |occ AS (
       |  SELECT doc_id, source,
       |         array_to_string(tks[i:i+1], ' ') AS bigram,
       |         tks[i] AS v, tks[i+1] AS w
       |  FROM pass, unnest(range(1, len(tks))) u(i)
       |  WHERE len(tks) >= 2),
       |sc AS (
       |  SELECT o.doc_id, o.source,
       |    log10(CASE WHEN lf.c_left IS NOT NULL THEN
       |        CAST(greatest(COALESCE(cb.c2, 0) * 4 - 3, 0) * tt.t
       |             + 3 * lf.n1f * (COALESCE(np.n1p, 0) + 1) AS DOUBLE)
       |        / CAST(4 * lf.c_left * tt.t AS DOUBLE)
       |      ELSE CAST(COALESCE(np.n1p, 0) + 1 AS DOUBLE)
       |           / CAST(tt.t AS DOUBLE) END) AS score
       |  FROM occ o
       |  LEFT JOIN c2s cb ON cb.bigram = o.bigram
       |  LEFT JOIN lf ON lf.v = o.v
       |  LEFT JOIN np ON np.w = o.w
       |  CROSS JOIN tt),
       |doc AS (
       |  SELECT doc_id, source, ${O.davg("score")} AS doc_log10
       |  FROM sc GROUP BY 1, 2),
       |bnd AS (
       |  SELECT quantile_disc(doc_log10, 0.3333333333333333) AS p_lo,
       |         quantile_disc(doc_log10, 0.6666666666666666) AS p_hi
       |  FROM doc)
       |SELECT CASE WHEN doc_log10 >= p_hi THEN 'head'
       |            WHEN doc_log10 >= p_lo THEN 'middle'
       |            ELSE 'tail' END AS bucket,
       |  source, count(*) AS n_docs,
       |  ${O.davg("doc_log10")} AS avg_doc_log10
       |FROM doc CROSS JOIN bnd
       |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin
  }

  /** DuckDB twin of [[mknHeldOutScore]]: same split hash, same trigram /
    * continuation count tables, the discounts computed from the same
    * count-of-count scalars with the IDENTICAL chain of double ops, and
    * the same nested branch CASEs (scored per occurrence — same values,
    * the score is a function of the trigram type alone). */
  /** The per-doc modified-KN CTE chain ending at `${p}doc` — the
    * [[backoffDocCtes]] prefix convention; with p = "" exactly the q251
    * oracle's chain. */
  private def mknDocCtes(p: String): String = {
    val O = graft.functions.ExactAgg.Sql
    s"""${p}c3 AS (
       |  SELECT array_to_string(tks[i:i+2], ' ') AS tri,
       |         array_to_string(tks[i:i+1], ' ') AS ctx,
       |         array_to_string(tks[i+1:i+2], ' ') AS bg,
       |         count(*) AS c3
       |  FROM tr, unnest(range(1, len(tks) - 1)) u(i)
       |  WHERE len(tks) >= 3 GROUP BY 1, 2, 3),
       |${p}ctx3 AS (
       |  SELECT ctx, CAST(sum(c3) AS BIGINT) AS c3tot,
       |    CAST(sum(CASE WHEN c3 = 1 THEN 1 ELSE 0 END) AS BIGINT) AS f1,
       |    CAST(sum(CASE WHEN c3 = 2 THEN 1 ELSE 0 END) AS BIGINT) AS f2,
       |    CAST(sum(CASE WHEN c3 >= 3 THEN 1 ELSE 0 END) AS BIGINT) AS f3p
       |  FROM ${p}c3 GROUP BY 1),
       |${p}cc2 AS (SELECT bg, count(*) AS cc2 FROM ${p}c3 GROUP BY 1),
       |${p}ctx2 AS (
       |  SELECT string_split(bg, ' ')[1] AS v,
       |    CAST(sum(cc2) AS BIGINT) AS cc2tot,
       |    CAST(sum(CASE WHEN cc2 = 1 THEN 1 ELSE 0 END) AS BIGINT) AS h1,
       |    CAST(sum(CASE WHEN cc2 = 2 THEN 1 ELSE 0 END) AS BIGINT) AS h2,
       |    CAST(sum(CASE WHEN cc2 >= 3 THEN 1 ELSE 0 END) AS BIGINT) AS h3p
       |  FROM ${p}cc2 GROUP BY 1),
       |${p}cu AS (
       |  SELECT string_split(bg, ' ')[-1] AS w, count(*) AS cu
       |  FROM ${p}cc2 GROUP BY 1),
       |${p}cf3 AS (
       |  SELECT
       |    CAST(sum(CASE WHEN c3 = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n1,
       |    CAST(sum(CASE WHEN c3 = 2 THEN 1 ELSE 0 END) AS BIGINT) AS n2,
       |    CAST(sum(CASE WHEN c3 = 3 THEN 1 ELSE 0 END) AS BIGINT) AS n3,
       |    CAST(sum(CASE WHEN c3 = 4 THEN 1 ELSE 0 END) AS BIGINT) AS n4
       |  FROM ${p}c3),
       |${p}cf2 AS (
       |  SELECT
       |    CAST(sum(CASE WHEN cc2 = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n1,
       |    CAST(sum(CASE WHEN cc2 = 2 THEN 1 ELSE 0 END) AS BIGINT) AS n2,
       |    CAST(sum(CASE WHEN cc2 = 3 THEN 1 ELSE 0 END) AS BIGINT) AS n3,
       |    CAST(sum(CASE WHEN cc2 = 4 THEN 1 ELSE 0 END) AS BIGINT) AS n4
       |  FROM ${p}cc2),
       |${p}y3 AS (
       |  SELECT CASE WHEN n1 > 0 THEN CAST(n1 AS DOUBLE)
       |    / (CAST(n1 AS DOUBLE) + 2.0 * CAST(n2 AS DOUBLE))
       |    ELSE 0.0 END AS y FROM ${p}cf3),
       |${p}y2 AS (
       |  SELECT CASE WHEN n1 > 0 THEN CAST(n1 AS DOUBLE)
       |    / (CAST(n1 AS DOUBLE) + 2.0 * CAST(n2 AS DOUBLE))
       |    ELSE 0.0 END AS y FROM ${p}cf2),
       |${p}disc AS (
       |  SELECT
       |    CASE WHEN cf3.n1 > 0 AND cf3.n2 > 0 AND cf3.n3 > 0
       |      THEN 1.0 - 2.0 * y3.y * CAST(cf3.n2 AS DOUBLE) / CAST(cf3.n1 AS DOUBLE)
       |      ELSE 0.75 END AS d13,
       |    CASE WHEN cf3.n1 > 0 AND cf3.n2 > 0 AND cf3.n3 > 0
       |      THEN greatest(2.0 - 3.0 * y3.y * CAST(cf3.n3 AS DOUBLE) / CAST(cf3.n2 AS DOUBLE), 0.1)
       |      ELSE 0.75 END AS d23,
       |    CASE WHEN cf3.n1 > 0 AND cf3.n2 > 0 AND cf3.n3 > 0
       |      THEN greatest(3.0 - 4.0 * y3.y * CAST(cf3.n4 AS DOUBLE) / CAST(cf3.n3 AS DOUBLE), 0.1)
       |      ELSE 0.75 END AS d33,
       |    CASE WHEN cf2.n1 > 0 AND cf2.n2 > 0 AND cf2.n3 > 0
       |      THEN 1.0 - 2.0 * y2.y * CAST(cf2.n2 AS DOUBLE) / CAST(cf2.n1 AS DOUBLE)
       |      ELSE 0.75 END AS d12,
       |    CASE WHEN cf2.n1 > 0 AND cf2.n2 > 0 AND cf2.n3 > 0
       |      THEN greatest(2.0 - 3.0 * y2.y * CAST(cf2.n3 AS DOUBLE) / CAST(cf2.n2 AS DOUBLE), 0.1)
       |      ELSE 0.75 END AS d22,
       |    CASE WHEN cf2.n1 > 0 AND cf2.n2 > 0 AND cf2.n3 > 0
       |      THEN greatest(3.0 - 4.0 * y2.y * CAST(cf2.n4 AS DOUBLE) / CAST(cf2.n3 AS DOUBLE), 0.1)
       |      ELSE 0.75 END AS d32
       |  FROM ${p}cf3 cf3, ${p}cf2 cf2, ${p}y3 y3, ${p}y2 y2),
       |${p}tt AS (
       |  SELECT (SELECT count(*) FROM ${p}cc2)
       |       + (SELECT count(DISTINCT u.tok)
       |          FROM (SELECT unnest(tks) AS tok FROM tr) u) + 1 AS t),
       |${p}occ AS (
       |  SELECT doc_id, source,
       |         array_to_string(tks[i:i+2], ' ') AS tri,
       |         array_to_string(tks[i:i+1], ' ') AS ctx,
       |         array_to_string(tks[i+1:i+2], ' ') AS bg,
       |         tks[i+1] AS v, tks[i+2] AS w
       |  FROM ho, unnest(range(1, len(tks) - 1)) u(i)
       |  WHERE len(tks) >= 3),
       |${p}j AS (
       |  SELECT o.doc_id, o.source,
       |    c3.c3 AS c3, x3.c3tot, x3.f1, x3.f2, x3.f3p,
       |    cb.cc2 AS cc2, x2.cc2tot, x2.h1, x2.h2, x2.h3p, cu.cu,
       |    disc.*, tt.t
       |  FROM ${p}occ o
       |  LEFT JOIN ${p}c3 c3 ON c3.tri = o.tri
       |  LEFT JOIN ${p}ctx3 x3 ON x3.ctx = o.ctx
       |  LEFT JOIN ${p}cc2 cb ON cb.bg = o.bg
       |  LEFT JOIN ${p}ctx2 x2 ON x2.v = o.v
       |  LEFT JOIN ${p}cu cu ON cu.w = o.w
       |  CROSS JOIN ${p}disc disc CROSS JOIN ${p}tt tt),
       |${p}s1 AS (
       |  SELECT *,
       |    CAST(COALESCE(cu, 0) + 1 AS DOUBLE) / CAST(t AS DOUBLE) AS p1
       |  FROM ${p}j),
       |${p}s2 AS (
       |  SELECT *,
       |    CASE WHEN cc2tot IS NOT NULL THEN
       |      greatest(CAST(COALESCE(cc2, 0) AS DOUBLE) -
       |        (CASE WHEN COALESCE(cc2, 0) = 0 THEN 0.0
       |              WHEN cc2 = 1 THEN d12
       |              WHEN cc2 = 2 THEN d22
       |              ELSE d32 END), 0.0) /
       |        CAST(cc2tot AS DOUBLE) +
       |        ((d12 * CAST(h1 AS DOUBLE) +
       |          d22 * CAST(h2 AS DOUBLE) +
       |          d32 * CAST(h3p AS DOUBLE)) /
       |          CAST(cc2tot AS DOUBLE)) * p1
       |    ELSE p1 END AS p2
       |  FROM ${p}s1),
       |${p}s3 AS (
       |  SELECT doc_id, source,
       |    CASE WHEN c3tot IS NOT NULL THEN 3
       |         WHEN cc2tot IS NOT NULL THEN 2
       |         WHEN cu IS NOT NULL THEN 1
       |         ELSE 0 END AS ord,
       |    log10(CASE WHEN c3tot IS NOT NULL THEN
       |      greatest(CAST(COALESCE(c3, 0) AS DOUBLE) -
       |        (CASE WHEN COALESCE(c3, 0) = 0 THEN 0.0
       |              WHEN c3 = 1 THEN d13
       |              WHEN c3 = 2 THEN d23
       |              ELSE d33 END), 0.0) /
       |        CAST(c3tot AS DOUBLE) +
       |        ((d13 * CAST(f1 AS DOUBLE) +
       |          d23 * CAST(f2 AS DOUBLE) +
       |          d33 * CAST(f3p AS DOUBLE)) /
       |          CAST(c3tot AS DOUBLE)) * p2
       |    ELSE p2 END) AS score
       |  FROM ${p}s2),
       |${p}doc AS (
       |  SELECT doc_id, source, count(*) AS n_trans,
       |    CAST(sum(CASE WHEN ord = 3 THEN 1 ELSE 0 END) AS BIGINT) AS n_mkn,
       |    CAST(sum(CASE WHEN ord = 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_big,
       |    CAST(sum(CASE WHEN ord = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_cont,
       |    CAST(sum(CASE WHEN ord = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_oov,
       |    ${O.davg("score")} AS doc_log10
       |  FROM ${p}s3 GROUP BY 1, 2)""".stripMargin
  }

  def mknHeldOutScoreSql(trainPct: Int = 80): String = {
    val O = graft.functions.ExactAgg.Sql
    s"""WITH ${splitCtes(trainPct)},
       |${mknDocCtes("")}
       |SELECT source, count(*) AS n_docs,
       |  CAST(sum(n_trans) AS BIGINT) AS n_trans,
       |  CAST(sum(n_mkn) AS BIGINT) AS n_mkn,
       |  CAST(sum(n_big) AS BIGINT) AS n_big,
       |  CAST(sum(n_cont) AS BIGINT) AS n_cont,
       |  CAST(sum(n_oov) AS BIGINT) AS n_oov,
       |  ${O.davg("doc_log10")} AS avg_doc_log10
       |FROM doc GROUP BY 1 ORDER BY 1""".stripMargin
  }

  /** The per-doc 4-gram modified-KN CTE chain ending at `${p}doc` — the
    * [[mknDocCtes]] recursion one order up, same prefix convention; the
    * discount CASEs, the continuation-count derivations and the nested
    * branch CASEs mirror [[mkn4DocScores]]/[[mkn4Build]] operation for
    * operation (the q251 fixed-IEEE-chain oracle discipline). */
  private def mkn4DocCtes(p: String): String = {
    val O = graft.functions.ExactAgg.Sql
    s"""${p}c4 AS (
       |  SELECT array_to_string(tks[i:i+3], ' ') AS quad,
       |         array_to_string(tks[i:i+2], ' ') AS ctx,
       |         array_to_string(tks[i+1:i+3], ' ') AS tg,
       |         count(*) AS c4
       |  FROM tr, unnest(range(1, len(tks) - 2)) u(i)
       |  WHERE len(tks) >= 4 GROUP BY 1, 2, 3),
       |${p}ctx4 AS (
       |  SELECT ctx, CAST(sum(c4) AS BIGINT) AS c4tot,
       |    CAST(sum(CASE WHEN c4 = 1 THEN 1 ELSE 0 END) AS BIGINT) AS g1,
       |    CAST(sum(CASE WHEN c4 = 2 THEN 1 ELSE 0 END) AS BIGINT) AS g2,
       |    CAST(sum(CASE WHEN c4 >= 3 THEN 1 ELSE 0 END) AS BIGINT) AS g3p
       |  FROM ${p}c4 GROUP BY 1),
       |${p}cc3 AS (SELECT tg, count(*) AS cc3 FROM ${p}c4 GROUP BY 1),
       |${p}cc3s AS (
       |  SELECT tg, cc3,
       |    array_to_string((string_split(tg, ' '))[1:2], ' ') AS ctx3,
       |    array_to_string((string_split(tg, ' '))[2:3], ' ') AS bg
       |  FROM ${p}cc3),
       |${p}ctx3c AS (
       |  SELECT ctx3, CAST(sum(cc3) AS BIGINT) AS cc3tot,
       |    CAST(sum(CASE WHEN cc3 = 1 THEN 1 ELSE 0 END) AS BIGINT) AS f1,
       |    CAST(sum(CASE WHEN cc3 = 2 THEN 1 ELSE 0 END) AS BIGINT) AS f2,
       |    CAST(sum(CASE WHEN cc3 >= 3 THEN 1 ELSE 0 END) AS BIGINT) AS f3p
       |  FROM ${p}cc3s GROUP BY 1),
       |${p}cc2x AS (SELECT bg, count(*) AS cc2 FROM ${p}cc3s GROUP BY 1),
       |${p}cc2s AS (
       |  SELECT bg, cc2,
       |    string_split(bg, ' ')[1] AS v,
       |    string_split(bg, ' ')[-1] AS w
       |  FROM ${p}cc2x),
       |${p}ctx2c AS (
       |  SELECT v, CAST(sum(cc2) AS BIGINT) AS cc2tot,
       |    CAST(sum(CASE WHEN cc2 = 1 THEN 1 ELSE 0 END) AS BIGINT) AS h1,
       |    CAST(sum(CASE WHEN cc2 = 2 THEN 1 ELSE 0 END) AS BIGINT) AS h2,
       |    CAST(sum(CASE WHEN cc2 >= 3 THEN 1 ELSE 0 END) AS BIGINT) AS h3p
       |  FROM ${p}cc2s GROUP BY 1),
       |${p}cuc AS (
       |  SELECT w, count(*) AS cu FROM ${p}cc2s GROUP BY 1),
       |${p}cg4 AS (
       |  SELECT
       |    CAST(sum(CASE WHEN c4 = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n1,
       |    CAST(sum(CASE WHEN c4 = 2 THEN 1 ELSE 0 END) AS BIGINT) AS n2,
       |    CAST(sum(CASE WHEN c4 = 3 THEN 1 ELSE 0 END) AS BIGINT) AS n3,
       |    CAST(sum(CASE WHEN c4 = 4 THEN 1 ELSE 0 END) AS BIGINT) AS n4
       |  FROM ${p}c4),
       |${p}cg3 AS (
       |  SELECT
       |    CAST(sum(CASE WHEN cc3 = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n1,
       |    CAST(sum(CASE WHEN cc3 = 2 THEN 1 ELSE 0 END) AS BIGINT) AS n2,
       |    CAST(sum(CASE WHEN cc3 = 3 THEN 1 ELSE 0 END) AS BIGINT) AS n3,
       |    CAST(sum(CASE WHEN cc3 = 4 THEN 1 ELSE 0 END) AS BIGINT) AS n4
       |  FROM ${p}cc3),
       |${p}cg2 AS (
       |  SELECT
       |    CAST(sum(CASE WHEN cc2 = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n1,
       |    CAST(sum(CASE WHEN cc2 = 2 THEN 1 ELSE 0 END) AS BIGINT) AS n2,
       |    CAST(sum(CASE WHEN cc2 = 3 THEN 1 ELSE 0 END) AS BIGINT) AS n3,
       |    CAST(sum(CASE WHEN cc2 = 4 THEN 1 ELSE 0 END) AS BIGINT) AS n4
       |  FROM ${p}cc2x),
       |${p}y4 AS (
       |  SELECT CASE WHEN n1 > 0 THEN CAST(n1 AS DOUBLE)
       |    / (CAST(n1 AS DOUBLE) + 2.0 * CAST(n2 AS DOUBLE))
       |    ELSE 0.0 END AS y FROM ${p}cg4),
       |${p}y3 AS (
       |  SELECT CASE WHEN n1 > 0 THEN CAST(n1 AS DOUBLE)
       |    / (CAST(n1 AS DOUBLE) + 2.0 * CAST(n2 AS DOUBLE))
       |    ELSE 0.0 END AS y FROM ${p}cg3),
       |${p}y2 AS (
       |  SELECT CASE WHEN n1 > 0 THEN CAST(n1 AS DOUBLE)
       |    / (CAST(n1 AS DOUBLE) + 2.0 * CAST(n2 AS DOUBLE))
       |    ELSE 0.0 END AS y FROM ${p}cg2),
       |${p}disc AS (
       |  SELECT
       |    CASE WHEN cg4.n1 > 0 AND cg4.n2 > 0 AND cg4.n3 > 0
       |      THEN 1.0 - 2.0 * y4.y * CAST(cg4.n2 AS DOUBLE) / CAST(cg4.n1 AS DOUBLE)
       |      ELSE 0.75 END AS d14,
       |    CASE WHEN cg4.n1 > 0 AND cg4.n2 > 0 AND cg4.n3 > 0
       |      THEN greatest(2.0 - 3.0 * y4.y * CAST(cg4.n3 AS DOUBLE) / CAST(cg4.n2 AS DOUBLE), 0.1)
       |      ELSE 0.75 END AS d24,
       |    CASE WHEN cg4.n1 > 0 AND cg4.n2 > 0 AND cg4.n3 > 0
       |      THEN greatest(3.0 - 4.0 * y4.y * CAST(cg4.n4 AS DOUBLE) / CAST(cg4.n3 AS DOUBLE), 0.1)
       |      ELSE 0.75 END AS d34,
       |    CASE WHEN cg3.n1 > 0 AND cg3.n2 > 0 AND cg3.n3 > 0
       |      THEN 1.0 - 2.0 * y3.y * CAST(cg3.n2 AS DOUBLE) / CAST(cg3.n1 AS DOUBLE)
       |      ELSE 0.75 END AS d13,
       |    CASE WHEN cg3.n1 > 0 AND cg3.n2 > 0 AND cg3.n3 > 0
       |      THEN greatest(2.0 - 3.0 * y3.y * CAST(cg3.n3 AS DOUBLE) / CAST(cg3.n2 AS DOUBLE), 0.1)
       |      ELSE 0.75 END AS d23,
       |    CASE WHEN cg3.n1 > 0 AND cg3.n2 > 0 AND cg3.n3 > 0
       |      THEN greatest(3.0 - 4.0 * y3.y * CAST(cg3.n4 AS DOUBLE) / CAST(cg3.n3 AS DOUBLE), 0.1)
       |      ELSE 0.75 END AS d33,
       |    CASE WHEN cg2.n1 > 0 AND cg2.n2 > 0 AND cg2.n3 > 0
       |      THEN 1.0 - 2.0 * y2.y * CAST(cg2.n2 AS DOUBLE) / CAST(cg2.n1 AS DOUBLE)
       |      ELSE 0.75 END AS d12,
       |    CASE WHEN cg2.n1 > 0 AND cg2.n2 > 0 AND cg2.n3 > 0
       |      THEN greatest(2.0 - 3.0 * y2.y * CAST(cg2.n3 AS DOUBLE) / CAST(cg2.n2 AS DOUBLE), 0.1)
       |      ELSE 0.75 END AS d22,
       |    CASE WHEN cg2.n1 > 0 AND cg2.n2 > 0 AND cg2.n3 > 0
       |      THEN greatest(3.0 - 4.0 * y2.y * CAST(cg2.n4 AS DOUBLE) / CAST(cg2.n3 AS DOUBLE), 0.1)
       |      ELSE 0.75 END AS d32
       |  FROM ${p}cg4 cg4, ${p}cg3 cg3, ${p}cg2 cg2,
       |       ${p}y4 y4, ${p}y3 y3, ${p}y2 y2),
       |${p}tt AS (
       |  SELECT (SELECT count(*) FROM ${p}cc2x)
       |       + (SELECT count(DISTINCT u.tok)
       |          FROM (SELECT unnest(tks) AS tok FROM tr) u) + 1 AS t),
       |${p}occ AS (
       |  SELECT doc_id, source,
       |         array_to_string(tks[i:i+3], ' ') AS quad,
       |         array_to_string(tks[i:i+2], ' ') AS ctx,
       |         array_to_string(tks[i+1:i+3], ' ') AS tg,
       |         array_to_string(tks[i+1:i+2], ' ') AS ctx3,
       |         array_to_string(tks[i+2:i+3], ' ') AS bg,
       |         tks[i+2] AS v, tks[i+3] AS w
       |  FROM ho, unnest(range(1, len(tks) - 2)) u(i)
       |  WHERE len(tks) >= 4),
       |${p}j AS (
       |  SELECT o.doc_id, o.source,
       |    c4.c4 AS c4, x4.c4tot, x4.g1, x4.g2, x4.g3p,
       |    c3.cc3 AS cc3, x3.cc3tot, x3.f1, x3.f2, x3.f3p,
       |    cb.cc2 AS cc2, x2.cc2tot, x2.h1, x2.h2, x2.h3p, cu.cu,
       |    disc.*, tt.t
       |  FROM ${p}occ o
       |  LEFT JOIN ${p}c4 c4 ON c4.quad = o.quad
       |  LEFT JOIN ${p}ctx4 x4 ON x4.ctx = o.ctx
       |  LEFT JOIN ${p}cc3 c3 ON c3.tg = o.tg
       |  LEFT JOIN ${p}ctx3c x3 ON x3.ctx3 = o.ctx3
       |  LEFT JOIN ${p}cc2x cb ON cb.bg = o.bg
       |  LEFT JOIN ${p}ctx2c x2 ON x2.v = o.v
       |  LEFT JOIN ${p}cuc cu ON cu.w = o.w
       |  CROSS JOIN ${p}disc disc CROSS JOIN ${p}tt tt),
       |${p}s1 AS (
       |  SELECT *,
       |    CAST(COALESCE(cu, 0) + 1 AS DOUBLE) / CAST(t AS DOUBLE) AS p1
       |  FROM ${p}j),
       |${p}s2 AS (
       |  SELECT *,
       |    CASE WHEN cc2tot IS NOT NULL THEN
       |      greatest(CAST(COALESCE(cc2, 0) AS DOUBLE) -
       |        (CASE WHEN COALESCE(cc2, 0) = 0 THEN 0.0
       |              WHEN cc2 = 1 THEN d12
       |              WHEN cc2 = 2 THEN d22
       |              ELSE d32 END), 0.0) /
       |        CAST(cc2tot AS DOUBLE) +
       |        ((d12 * CAST(h1 AS DOUBLE) +
       |          d22 * CAST(h2 AS DOUBLE) +
       |          d32 * CAST(h3p AS DOUBLE)) /
       |          CAST(cc2tot AS DOUBLE)) * p1
       |    ELSE p1 END AS p2
       |  FROM ${p}s1),
       |${p}s3 AS (
       |  SELECT *,
       |    CASE WHEN cc3tot IS NOT NULL THEN
       |      greatest(CAST(COALESCE(cc3, 0) AS DOUBLE) -
       |        (CASE WHEN COALESCE(cc3, 0) = 0 THEN 0.0
       |              WHEN cc3 = 1 THEN d13
       |              WHEN cc3 = 2 THEN d23
       |              ELSE d33 END), 0.0) /
       |        CAST(cc3tot AS DOUBLE) +
       |        ((d13 * CAST(f1 AS DOUBLE) +
       |          d23 * CAST(f2 AS DOUBLE) +
       |          d33 * CAST(f3p AS DOUBLE)) /
       |          CAST(cc3tot AS DOUBLE)) * p2
       |    ELSE p2 END AS p3
       |  FROM ${p}s2),
       |${p}s4 AS (
       |  SELECT doc_id, source,
       |    CASE WHEN c4tot IS NOT NULL THEN 4
       |         WHEN cc3tot IS NOT NULL THEN 3
       |         WHEN cc2tot IS NOT NULL THEN 2
       |         WHEN cu IS NOT NULL THEN 1
       |         ELSE 0 END AS ord,
       |    log10(CASE WHEN c4tot IS NOT NULL THEN
       |      greatest(CAST(COALESCE(c4, 0) AS DOUBLE) -
       |        (CASE WHEN COALESCE(c4, 0) = 0 THEN 0.0
       |              WHEN c4 = 1 THEN d14
       |              WHEN c4 = 2 THEN d24
       |              ELSE d34 END), 0.0) /
       |        CAST(c4tot AS DOUBLE) +
       |        ((d14 * CAST(g1 AS DOUBLE) +
       |          d24 * CAST(g2 AS DOUBLE) +
       |          d34 * CAST(g3p AS DOUBLE)) /
       |          CAST(c4tot AS DOUBLE)) * p3
       |    ELSE p3 END) AS score
       |  FROM ${p}s3),
       |${p}doc AS (
       |  SELECT doc_id, source, count(*) AS n_trans,
       |    CAST(sum(CASE WHEN ord = 4 THEN 1 ELSE 0 END) AS BIGINT) AS n_mkn4,
       |    CAST(sum(CASE WHEN ord = 3 THEN 1 ELSE 0 END) AS BIGINT) AS n_tri,
       |    CAST(sum(CASE WHEN ord = 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_big,
       |    CAST(sum(CASE WHEN ord = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_cont,
       |    CAST(sum(CASE WHEN ord = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_oov,
       |    ${O.davg("score")} AS doc_log10
       |  FROM ${p}s4 GROUP BY 1, 2)""".stripMargin
  }

  def mkn4HeldOutScoreSql(trainPct: Int = 80): String = {
    val O = graft.functions.ExactAgg.Sql
    s"""WITH ${splitCtes(trainPct)},
       |${mkn4DocCtes("")}
       |SELECT source, count(*) AS n_docs,
       |  CAST(sum(n_trans) AS BIGINT) AS n_trans,
       |  CAST(sum(n_mkn4) AS BIGINT) AS n_mkn4,
       |  CAST(sum(n_tri) AS BIGINT) AS n_tri,
       |  CAST(sum(n_big) AS BIGINT) AS n_big,
       |  CAST(sum(n_cont) AS BIGINT) AS n_cont,
       |  CAST(sum(n_oov) AS BIGINT) AS n_oov,
       |  ${O.davg("doc_log10")} AS avg_doc_log10
       |FROM doc GROUP BY 1 ORDER BY 1""".stripMargin
  }

  // ── q255: scorer-agreement cube ───────────────────────────────────────

  /** q255: the LM-scorer AGREEMENT cube — do the cheap and expensive
    * quality scorers agree on which third of the corpus to keep? Every
    * held-out document is scored by all three LM-quality scorers this
    * engine ships (q246 Stupid Backoff — model-free; q248 interpolated
    * bigram KN; q251 trigram modified KN — the production-grade one),
    * each scorer's head/middle/tail terciles are cut on the SAME joined
    * doc set at the `percentile_disc` values (the q253 boundary
    * discipline — computed scale-safe via [[graft.operators.Analytics
    * .gridQuantileDiscs]], six driver scalars instead of one all-values
    * aggregation buffer), and
    * the 3×3×3 contingency cube is reported: one row per bucket triple
    * with its doc count. Mass on the diagonal = the cheap scorer is a
    * faithful proxy; off-diagonal corners = documents a backoff scorer
    * would keep but modified-KN would drop (or vice versa) — exactly the
    * audit a pipeline runs before swapping a cheaper filter in. The q242
    * dup-signal agreement cross-tab, applied to the scorer family.
    *
    * Scale shape: three corpus-linear scorer passes (each the established
    * q246/q248/q251 plan), one doc-keyed 3-way equi-join, six
    * grid-selected boundary scalars folded back as literals, one roll-up
    * to ≤ 27 rows. */
  def scorerAgreement(t: Tables, trainPct: Int = 80): DataFrame = {
    val held = t.documents
      .select(col("doc_id"), col("source"), col("text"))
      .where(Sampling.hashBucket(col("doc_id")) >= trainPct)
    val bo = backoffPerDoc(t, trainPct)
      .select(col("doc_id"), col("doc_log10").as("bo_score"))
    val kn = knDocScores(held, knModel(t, trainPct))
      .select(col("doc_id"), col("doc_log10").as("kn_score"))
    val mk = mknDocScores(held, mknModel(t, trainPct))
      .select(col("doc_id"), col("doc_log10").as("mkn_score"))
    // inner joins land on the docs every scorer defines (≥ 3 tokens —
    // backoff/MKN score trigrams); one materialization feeds the
    // boundary aggregate AND the bucket assignment
    val j = bo.join(kn, Seq("doc_id")).join(mk, Seq("doc_id"))
      .localCheckpoint()
    val terciles = Seq(0.3333333333333333, 0.6666666666666666)
    def cuts(c: String): Seq[Double] =
      graft.operators.Analytics.gridQuantileDiscs(j, c, terciles)
    def bucket(s: String, lohi: Seq[Double]) =
      when(col(s) >= lit(lohi(1)), lit("head"))
        .when(col(s) >= lit(lohi.head), lit("middle"))
        .otherwise(lit("tail"))
    j.select(
        bucket("bo_score", cuts("bo_score")).as("bo_bucket"),
        bucket("kn_score", cuts("kn_score")).as("kn_bucket"),
        bucket("mkn_score", cuts("mkn_score")).as("mkn_bucket"))
      .groupBy("bo_bucket", "kn_bucket", "mkn_bucket")
      .agg(count(lit(1)).as("n_docs"))
      .orderBy("bo_bucket", "kn_bucket", "mkn_bucket")
  }

  /** DuckDB twin of [[scorerAgreement]]: the three per-doc scorer chains
    * — [[backoffDocCtes]] / [[knDocCtes]] / [[mknDocCtes]], the EXACT
    * strings the q246/q248/q251 oracles run, coexisting under prefixes —
    * joined on doc_id, quantile_disc boundaries, the same bucket CASEs. */
  def scorerAgreementSql(trainPct: Int = 80, alpha: Double = 0.4): String =
    s"""WITH ${splitCtes(trainPct)},
       |${backoffDocCtes(alpha, "b")},
       |${knDocCtes("k")},
       |${mknDocCtes("m")},
       |jd AS (
       |  SELECT b.doc_id, b.doc_log10 AS bo_score,
       |         k.doc_log10 AS kn_score, m.doc_log10 AS mkn_score
       |  FROM bdoc b
       |  JOIN kdoc k ON k.doc_id = b.doc_id
       |  JOIN mdoc m ON m.doc_id = b.doc_id),
       |bnd AS (
       |  SELECT quantile_disc(bo_score, 0.3333333333333333) AS bo_lo,
       |         quantile_disc(bo_score, 0.6666666666666666) AS bo_hi,
       |         quantile_disc(kn_score, 0.3333333333333333) AS kn_lo,
       |         quantile_disc(kn_score, 0.6666666666666666) AS kn_hi,
       |         quantile_disc(mkn_score, 0.3333333333333333) AS mkn_lo,
       |         quantile_disc(mkn_score, 0.6666666666666666) AS mkn_hi
       |  FROM jd)
       |SELECT
       |  CASE WHEN bo_score >= bo_hi THEN 'head'
       |       WHEN bo_score >= bo_lo THEN 'middle'
       |       ELSE 'tail' END AS bo_bucket,
       |  CASE WHEN kn_score >= kn_hi THEN 'head'
       |       WHEN kn_score >= kn_lo THEN 'middle'
       |       ELSE 'tail' END AS kn_bucket,
       |  CASE WHEN mkn_score >= mkn_hi THEN 'head'
       |       WHEN mkn_score >= mkn_lo THEN 'middle'
       |       ELSE 'tail' END AS mkn_bucket,
       |  count(*) AS n_docs
       |FROM jd CROSS JOIN bnd
       |GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin

  // ── q257: quality × novelty crawl-triage grid ─────────────────────────

  /** q257: the 2-D crawl-triage grid — q253's perplexity QUALITY terciles
    * crossed with q254's surprisal-vs-served-index NOVELTY terciles on
    * the same funnel-passing documents: each doc lands in a 3×3 cell and
    * the cell determines the dataset-build action. Triage policy (a
    * deterministic CASE, replayed by the oracle): the quality TAIL is
    * `drop`ped wholesale (badly modeled by the corpus LM — the CCNet
    * cut, whatever its novelty: junk that is also novel is still junk);
    * surviving docs in the novelty HEAD are `reprocess` (well-modeled
    * content whose transitions the SERVED index finds most surprising —
    * the crawl-frontier signal: content the index has not absorbed, worth
    * a recrawl/priority pass); everything else is `keep`. Report per
    * cell: doc count and both mean scores.
    *
    * This is the composition the r10 roadmap called for — quality alone
    * (q253) cannot distinguish "well-modeled because valuable" from
    * "well-modeled because already memorized"; novelty alone (q254)
    * cannot distinguish "novel because new" from "novel because garbage".
    * The grid separates all four corners.
    *
    * Scale shape: one KN scoring pass + one surprisal scoring pass (both
    * corpus-linear, the index/model sides read persisted artifacts), a
    * doc-keyed equi-join materialized once, four boundary scalars from
    * the bounded-memory [[graft.operators.Analytics.gridQuantileDiscs]]
    * selection (the q253 r11 discipline — never a single-buffer
    * percentile), one ≤9-cell roll-up. */
  def qualityNoveltyGrid(t: Tables, trainPct: Int = 80,
                         n: Int = 3): DataFrame = {
    val E = graft.functions.ExactAgg
    val m = knModel(t, trainPct)
    val sm = surprisalModel(t, n)
    val passing = t.documents
      .select(col("doc_id"), col("source"), col("text"))
      .where(TextAnalysis.qualityPass(col("text")))
    val quality = knDocScores(passing, m)
      .select(col("doc_id"), col("doc_log10"))
    val novelty = surprisalDocScores(passing, sm, n)
      .select(col("doc_id"), col("doc_surprisal"))
    // one materialization feeds both boundary selections AND the grid
    val j = quality.join(novelty, Seq("doc_id")).localCheckpoint()
    val ts = Seq(0.3333333333333333, 0.6666666666666666)
    val qb = graft.operators.Analytics.gridQuantileDiscs(j, "doc_log10", ts)
    val sb = graft.operators.Analytics.gridQuantileDiscs(j, "doc_surprisal", ts)
    def bucket(c: String, lohi: Seq[Double]) =
      when(col(c) >= lit(lohi(1)), lit("head"))
        .when(col(c) >= lit(lohi.head), lit("middle"))
        .otherwise(lit("tail"))
    j.select(
        bucket("doc_log10", qb).as("quality_bucket"),
        bucket("doc_surprisal", sb).as("novelty_bucket"),
        col("doc_log10"), col("doc_surprisal"))
      .withColumn("triage",
        when(col("quality_bucket") === "tail", lit("drop"))
          .when(col("novelty_bucket") === "head", lit("reprocess"))
          .otherwise(lit("keep")))
      .groupBy("quality_bucket", "novelty_bucket", "triage")
      .agg(
        count(lit(1)).as("n_docs"),
        E.davg(col("doc_log10")).as("avg_doc_log10"),
        E.davg(col("doc_surprisal")).as("avg_doc_surprisal"))
      .orderBy("quality_bucket", "novelty_bucket")
  }

  /** DuckDB twin of [[qualityNoveltyGrid]]: q253's funnel + KN scoring
    * chain and q254's surprisal chain (index counts recomputed from the
    * raw corpus, occurrences restricted to the funnel-passing docs)
    * joined on doc_id, quantile_disc boundaries, the same bucket and
    * triage CASEs. */
  def qualityNoveltyGridSql(trainPct: Int = 80, n: Int = 3): String = {
    val O = graft.functions.ExactAgg.Sql
    val h = s"((${Sampling.splitHashSql("doc_id")}) % 100)"
    val stop = TextAnalysis.stopwords.map(s => s"'$s'").mkString("[", ", ", "]")
    s"""WITH d AS (
       |  SELECT doc_id, source, text,
       |         string_split_regex(trim(text), '\\s+') AS tks,
       |         $h AS b
       |  FROM documents),
       |tr AS (SELECT * FROM d WHERE b < $trainPct),
       |pass AS (
       |  SELECT * FROM d
       |  WHERE len(tks) BETWEEN 10 AND 100000
       |    AND CAST(length(text) AS DOUBLE) / len(tks) >= 2.0e0
       |    AND CAST(length(text) AS DOUBLE) / len(tks) <= 12.0e0
       |    AND CAST(len(list_distinct(tks)) AS DOUBLE) / len(tks) >= 0.3e0
       |    AND len(list_filter(tks, tk -> list_contains($stop, tk))) >= 1),
       |c2 AS (
       |  SELECT array_to_string(tks[i:i+1], ' ') AS bigram, count(*) AS c2
       |  FROM tr, unnest(range(1, len(tks))) u(i)
       |  WHERE len(tks) >= 2 GROUP BY 1),
       |c2s AS (
       |  SELECT bigram, c2,
       |    string_split(bigram, ' ')[1] AS v,
       |    string_split(bigram, ' ')[-1] AS w
       |  FROM c2),
       |lf AS (
       |  SELECT v, CAST(sum(c2) AS BIGINT) AS c_left, count(*) AS n1f
       |  FROM c2s GROUP BY 1),
       |np AS (SELECT w, count(*) AS n1p FROM c2s GROUP BY 1),
       |tt AS (
       |  SELECT (SELECT count(*) FROM c2s)
       |       + (SELECT count(DISTINCT u.tok)
       |          FROM (SELECT unnest(tks) AS tok FROM tr) u) + 1 AS t),
       |kocc AS (
       |  SELECT doc_id,
       |         array_to_string(tks[i:i+1], ' ') AS bigram,
       |         tks[i] AS v, tks[i+1] AS w
       |  FROM pass, unnest(range(1, len(tks))) u(i)
       |  WHERE len(tks) >= 2),
       |ksc AS (
       |  SELECT o.doc_id,
       |    log10(CASE WHEN lf.c_left IS NOT NULL THEN
       |        CAST(greatest(COALESCE(cb.c2, 0) * 4 - 3, 0) * tt.t
       |             + 3 * lf.n1f * (COALESCE(np.n1p, 0) + 1) AS DOUBLE)
       |        / CAST(4 * lf.c_left * tt.t AS DOUBLE)
       |      ELSE CAST(COALESCE(np.n1p, 0) + 1 AS DOUBLE)
       |           / CAST(tt.t AS DOUBLE) END) AS score
       |  FROM kocc o
       |  LEFT JOIN c2s cb ON cb.bigram = o.bigram
       |  LEFT JOIN lf ON lf.v = o.v
       |  LEFT JOIN np ON np.w = o.w
       |  CROSS JOIN tt),
       |kdoc AS (
       |  SELECT doc_id, ${O.davg("score")} AS doc_log10
       |  FROM ksc GROUP BY 1),
       |sg AS (
       |  SELECT array_to_string(tks[i:i+${n - 2}], ' ') AS context,
       |         tks[i+${n - 1}] AS next
       |  FROM d, unnest(range(1, len(tks) - ${n - 2})) u(i)
       |  WHERE len(tks) >= $n),
       |scnt AS (SELECT context, next, count(*) AS cnt FROM sg GROUP BY 1, 2),
       |stot AS (SELECT context, CAST(sum(cnt) AS BIGINT) AS context_total
       |         FROM scnt GROUP BY 1),
       |snt AS (SELECT CAST(sum(cnt) AS BIGINT) AS n_total FROM scnt),
       |socc AS (
       |  SELECT doc_id,
       |         array_to_string(tks[i:i+${n - 2}], ' ') AS context,
       |         tks[i+${n - 1}] AS next
       |  FROM pass, unnest(range(1, len(tks) - ${n - 2})) u(i)
       |  WHERE len(tks) >= $n),
       |ssc AS (
       |  SELECT o.doc_id,
       |    -log10(CASE WHEN c.cnt IS NOT NULL THEN
       |        CAST(c.cnt AS DOUBLE) / CAST(t.context_total AS DOUBLE)
       |      WHEN t.context_total IS NOT NULL THEN
       |        1.0 / CAST(t.context_total + 1 AS DOUBLE)
       |      ELSE 1.0 / CAST(nt.n_total + 1 AS DOUBLE) END) AS surprisal
       |  FROM socc o
       |  LEFT JOIN scnt c ON c.context = o.context AND c.next = o.next
       |  LEFT JOIN stot t ON t.context = o.context
       |  CROSS JOIN snt nt),
       |sdoc AS (
       |  SELECT doc_id, ${O.davg("surprisal")} AS doc_surprisal
       |  FROM ssc GROUP BY 1),
       |jd AS (
       |  SELECT k.doc_id, k.doc_log10, s.doc_surprisal
       |  FROM kdoc k JOIN sdoc s ON s.doc_id = k.doc_id),
       |bnd AS (
       |  SELECT quantile_disc(doc_log10, 0.3333333333333333) AS q_lo,
       |         quantile_disc(doc_log10, 0.6666666666666666) AS q_hi,
       |         quantile_disc(doc_surprisal, 0.3333333333333333) AS s_lo,
       |         quantile_disc(doc_surprisal, 0.6666666666666666) AS s_hi
       |  FROM jd),
       |lab AS (
       |  SELECT
       |    CASE WHEN doc_log10 >= q_hi THEN 'head'
       |         WHEN doc_log10 >= q_lo THEN 'middle'
       |         ELSE 'tail' END AS quality_bucket,
       |    CASE WHEN doc_surprisal >= s_hi THEN 'head'
       |         WHEN doc_surprisal >= s_lo THEN 'middle'
       |         ELSE 'tail' END AS novelty_bucket,
       |    doc_log10, doc_surprisal
       |  FROM jd CROSS JOIN bnd)
       |SELECT quality_bucket, novelty_bucket,
       |  CASE WHEN quality_bucket = 'tail' THEN 'drop'
       |       WHEN novelty_bucket = 'head' THEN 'reprocess'
       |       ELSE 'keep' END AS triage,
       |  count(*) AS n_docs,
       |  ${O.davg("doc_log10")} AS avg_doc_log10,
       |  ${O.davg("doc_surprisal")} AS avg_doc_surprisal
       |FROM lab GROUP BY 1, 2, 3 ORDER BY 1, 2""".stripMargin
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
