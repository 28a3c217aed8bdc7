package graft.ext

import graft.core.Tables
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed BPE (byte-pair-encoding) merge training — tokenizer
  * induction over a corpus (Sennrich et al. 2016), the vocabulary-build
  * step of an LLM data pipeline.
  *
  * Scale shape: BPE never iterates over the corpus. One corpus pass builds
  * the word-frequency table (the only full-data shuffle); every merge round
  * then runs on that vocabulary-sized frame (millions of rows at web
  * scale — still distributed, but 10^6× smaller than the corpus). Per
  * round: one aggregate for pair frequencies, a 1-row argmax to the driver
  * (the merge RULE is driver-state by definition — it IS the output), and
  * one narrow rebuild of the token arrays. localCheckpoint per round keeps
  * the plan from growing with the merge count, the same pattern as the
  * connected-components closure.
  *
  * Greedy left-to-right application is made shuffle-friendly by the
  * runs-parity formulation: candidate positions of the winning pair that
  * sit consecutively (overlapping occurrences like "aaa" for merge (a,a))
  * form runs, and exactly the 1st, 3rd, 5th… of each run merge — byte-wise
  * identical to a sequential scan, but computable with two windows over
  * the exploded positions. Ties in the argmax break on (pair_left,
  * pair_right) so the whole training is deterministic and the DuckDB
  * oracle replays every round bit-for-bit.
  */
object Bpe {

  /** A trained tokenizer: the merge-rule table and the word → token-array
    * vocabulary state it left behind. Train once, [[encode]] any number of
    * corpora — encoding never re-runs merges (it is a broadcast join
    * against [[wordTokens]]). Both frames are localCheckpoint-backed, so
    * the model is valid for the lifetime of its SparkSession; persist
    * [[merges]]/[[vocab]] as tables to ship it across sessions. */
  final case class BpeModel(merges: DataFrame, vocab: DataFrame) {

    /** word → (n_chars, n_toks) lookup, the broadcast side of encoding. */
    def wordTokens: DataFrame = vocab.select(
      col("word"),
      length(col("word")).as("n_chars"),
      size(col("toks")).as("n_toks"))

    /** Per-document word/BPE-token counts + compression for any frame with
      * (doc_id, text) — words absent from the training vocabulary fall
      * back to character count (the unknown-word floor: zero learned
      * merges apply). */
    def encode(docs: DataFrame): DataFrame =
      docs
        .select(col("doc_id"), explode(TextAnalysis.tokens(lower(col("text")))).as("word"))
        .filter(length(col("word")) > 0)
        .join(broadcast(wordTokens), Seq("word"), "left")
        .select(col("doc_id"),
          coalesce(col("n_chars"), length(col("word"))).as("n_chars"),
          coalesce(col("n_toks"), length(col("word"))).as("n_toks"))
        .groupBy(col("doc_id"))
        .agg(
          count(lit(1)).as("n_words"),
          sum(col("n_chars")).as("n_word_chars"),
          sum(col("n_toks")).as("n_bpe_tokens"))
        .withColumn("compression",
          round(col("n_word_chars").cast("double") / col("n_bpe_tokens"), 6))
        .orderBy(col("doc_id"))
  }

  /** Train a BPE model on any frame with a `text` column. */
  def train(docs: DataFrame, merges: Int = 8): BpeModel = {
    val (rules, vocab) = trainFrom(docs, merges)
    BpeModel(rules, vocab)
  }

  /** q117: the first `merges` BPE merge rules learned from the documents
    * corpus — (rank, left_tok, right_tok, merged, freq). */
  def bpeMerges(t: Tables, merges: Int = 8): DataFrame =
    bpeMergesFrom(t.documents, merges)

  /** [[bpeMerges]] over any frame with a `text` column. */
  def bpeMergesFrom(docs: DataFrame, merges: Int): DataFrame =
    trainFrom(docs, merges)._1

  /** The training loop, returning both the merge-rule table and the final
    * word → token-array vocabulary state (the encode side reuses the
    * latter: the corpus is ENCODED by a broadcast join against the
    * vocabulary, never by re-running merges over full text). */
  private def trainFrom(docs: DataFrame, merges: Int): (DataFrame, DataFrame) = {
    val spark = docs.sparkSession
    import spark.implicits._

    // the word-frequency table: BPE's working set. Chars via an explicit
    // substring transform (same char semantics as the oracle's slicing).
    var words = docs
      .select(explode(TextAnalysis.tokens(lower(col("text")))).as("word"))
      .filter(length(col("word")) > 0)
      .groupBy(col("word")).agg(count(lit(1)).as("cnt"))
      .withColumn("toks",
        expr("transform(sequence(1, length(word)), i -> substring(word, i, 1))"))
      .localCheckpoint()

    val rules = Seq.newBuilder[(Int, String, String, String, Long)]
    var rank = 1
    var exhausted = false
    while (rank <= merges && !exhausted) {
      // adjacent-pair frequencies, weighted by word count (every occurrence
      // inside a word counts, standard BPE)
      val best = words
        .select(col("cnt"), col("toks"),
          posexplode(expr("slice(toks, 1, size(toks) - 1)")).as(Seq("i", "a")))
        .withColumn("b", expr("toks[i + 1]"))
        .groupBy(col("a"), col("b")).agg(sum(col("cnt")).as("freq"))
        .orderBy(col("freq").desc, col("a"), col("b"))
        .limit(1)
        .collect()
      if (best.isEmpty) exhausted = true
      else {
        val (ba, bb, bf) = (best(0).getString(0), best(0).getString(1), best(0).getLong(2))
        rules += ((rank, ba, bb, ba + bb, bf))

        // greedy application: candidate positions → runs → odd-in-run kept
        val cand = words
          .select(col("word"), col("toks"),
            posexplode(expr("slice(toks, 1, size(toks) - 1)")).as(Seq("i", "a")))
          .filter(col("a") === lit(ba) && expr("toks[i + 1]") === lit(bb))
          .select(col("word"), col("i"))
        val kept = cand
          .withColumn("rn", row_number().over(Window.partitionBy(col("word")).orderBy(col("i"))))
          .withColumn("rr", row_number().over(
            Window.partitionBy(col("word"), col("i") - col("rn")).orderBy(col("i"))))
          .filter(pmod(col("rr"), lit(2)) === 1)
          .groupBy(col("word")).agg(collect_list(col("i")).as("kept"))

        words = words
          .join(kept, Seq("word"), "left")
          .withColumn("keptA", coalesce(col("kept"), expr("CAST(array() AS ARRAY<INT>)")))
          .withColumn("toks", expr(
            """filter(
              |  transform(sequence(0, size(toks) - 1), i ->
              |    CASE WHEN array_contains(keptA, i) THEN concat(toks[i], toks[i + 1])
              |         WHEN array_contains(keptA, i - 1) THEN CAST(NULL AS STRING)
              |         ELSE toks[i] END),
              |  x -> x IS NOT NULL)""".stripMargin))
          .select(col("word"), col("cnt"), col("toks"))
          .localCheckpoint()
        rank += 1
      }
    }
    (rules.result()
      .toDF("rank", "left_tok", "right_tok", "merged", "freq")
      .orderBy(col("rank")),
      words)
  }

  /** q118: corpus encoding under the learned vocabulary — per-document
    * word count, BPE token count, and compression ratio (chars per BPE
    * token, the metric a tokenizer build is judged on).
    *
    * Scale shape: the expensive part (merge training + vocabulary
    * tokenization) ran on the word table; encoding the corpus is then one
    * NARROW explode plus a broadcast join against the word → token-count
    * vocabulary — no shuffle touches full text, and the only exchange is
    * the per-document aggregate. */
  def bpeEncode(t: Tables, merges: Int = 8): DataFrame =
    train(t.documents, merges).encode(t.documents)

  /** The DuckDB mirror of [[bpeEncode]]: the q117 rounds unrolled, then
    * the corpus joined to the final vocabulary state. */
  def bpeEncodeSql(merges: Int = 8): String =
    s"""WITH ${trainingCtesSql(merges)}
       |SELECT d.doc_id,
       | count(*) AS n_words,
       | CAST(sum(length(d.word)) AS BIGINT) AS n_word_chars,
       | CAST(sum(len(t.toks)) AS BIGINT) AS n_bpe_tokens,
       | round(CAST(sum(length(d.word)) AS DOUBLE) / sum(len(t.toks)), 6) AS compression
       |FROM (SELECT doc_id,
       |        unnest(string_split_regex(trim(lower(text)), '\\s+')) AS word
       |      FROM documents) d
       |JOIN t$merges t USING (word)
       |WHERE length(d.word) > 0
       |GROUP BY d.doc_id
       |ORDER BY d.doc_id""".stripMargin

  /** The DuckDB mirror of [[bpeMerges]]: the shared training CTE chain
    * plus one SELECT arm per learned rule. */
  def bpeMergesSql(merges: Int = 8): String = {
    val arms = (1 to merges)
      .map(r => s"SELECT $r AS rank, a AS left_tok, b AS right_tok, a || b AS merged, freq FROM best_$r")
      .mkString("\nUNION ALL\n")
    s"WITH ${trainingCtesSql(merges)}\n$arms\nORDER BY rank"
  }

  /** The training rounds unrolled as a CTE chain — the shared body of
    * [[bpeMergesSql]] and [[bpeEncodeSql]] (SQL has no loops; the rule
    * count is a training parameter, so unrolling is exact, not an
    * approximation). Every CTE is `AS MATERIALIZED`: each round references
    * the previous one three times, and inlining makes evaluation
    * 3^rounds-exponential (measured >60 s for 8 rounds vs 0.2 s
    * materialized). */
  private def trainingCtesSql(merges: Int): String = {
    val base =
      """wc AS MATERIALIZED (
        |  SELECT word, count(*) AS cnt
        |  FROM (SELECT unnest(string_split_regex(trim(lower(text)), '\s+')) AS word
        |        FROM documents)
        |  WHERE length(word) > 0 GROUP BY 1),
        |t0 AS MATERIALIZED (
        |  SELECT word, cnt,
        |   list_transform(range(1, length(word) + 1), i -> word[i:i]) AS toks
        |  FROM wc)""".stripMargin
    val rounds = (1 to merges).map { r =>
      val p = s"t${r - 1}"
      s"""pf_$r AS MATERIALIZED (
         |  SELECT t.toks[i] AS a, t.toks[i + 1] AS b, CAST(sum(t.cnt) AS BIGINT) AS freq
         |  FROM $p t, unnest(range(1, len(t.toks))) AS u(i)
         |  GROUP BY 1, 2),
         |best_$r AS MATERIALIZED (SELECT a, b, freq FROM pf_$r ORDER BY freq DESC, a, b LIMIT 1),
         |cand_$r AS MATERIALIZED (
         |  SELECT t.word, i
         |  FROM $p t, unnest(range(1, len(t.toks))) AS u(i), best_$r
         |  WHERE t.toks[i] = best_$r.a AND t.toks[i + 1] = best_$r.b),
         |kept_$r AS MATERIALIZED (
         |  SELECT word, list(i ORDER BY i) AS kept FROM (
         |    SELECT word, i,
         |      row_number() OVER (PARTITION BY word, i - rn ORDER BY i) AS rr
         |    FROM (SELECT word, i,
         |            row_number() OVER (PARTITION BY word ORDER BY i) AS rn
         |          FROM cand_$r))
         |  WHERE rr % 2 = 1 GROUP BY word),
         |t$r AS MATERIALIZED (
         |  SELECT t.word, t.cnt,
         |   list_filter(
         |     list_transform(range(1, len(t.toks) + 1), i ->
         |       CASE WHEN list_contains(coalesce(k.kept, []), i)
         |              THEN t.toks[i] || t.toks[i + 1]
         |            WHEN list_contains(coalesce(k.kept, []), i - 1)
         |              THEN NULL
         |            ELSE t.toks[i] END),
         |     x -> x IS NOT NULL) AS toks
         |  FROM $p t LEFT JOIN kept_$r k USING (word))""".stripMargin
    }
    s"$base,\n${rounds.mkString(",\n")}"
  }
}
