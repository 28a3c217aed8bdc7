package graft

import graft.core.Tables
import graft.ext.{Sampling, Similarity, TextAnalysis}
import org.apache.spark.sql.functions._

/** Semantics of the corpus-signal wave (q176–q179): DSIR-style importance
  * resampling, PMI collocations, JL projection distortion, and the
  * Heaps'-law vocabulary-growth curve. Bit-parity with DuckDB is the
  * oracle gate's job; these tests pin the SEMANTICS on constructed
  * corpora where the right answer is known by hand.
  */
class CorpusSignalsSpec extends SparkSpec {

  /** Write a synthetic documents table (schema-identical to the fixture)
    * and return a Tables bound to it. */
  private def docsTable(rows: Seq[(Long, String, String, String)]): Tables = {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("corpus_sig").toString
    rows.toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars", length(col("text")).cast("long"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    Tables(spark, dir)
  }

  // ── q176 importance resampling ──────────────────────────────────────

  test("q176: target-like documents outrank source-like ones; target rows excluded") {
    // target domain (en) speaks "alpha"; the raw pool has a pure-alpha
    // doc (most target-like), a mixed doc, and a pure-beta doc
    val t = docsTable(Seq(
      (0L, "alpha alpha alpha alpha", "en", "tgt"),
      (1L, "alpha alpha beta alpha", "en", "tgt"),
      (10L, "alpha alpha alpha alpha", "xx", "raw"),
      (11L, "alpha alpha beta beta", "xx", "raw"),
      (12L, "beta beta beta beta", "xx", "raw")))
    val got = Sampling.importanceResample(t, targetLang = "en", k = 10)
      .collect()
    assert(got.map(_.getLong(1)).toSeq == Seq(10L, 11L, 12L),
      "expected target-likeness ordering 10 > 11 > 12")
    assert(got.forall(_.getString(3) == "xx"), "target-lang rows must not be resampled")
    assert(got.map(_.getInt(0)).toSeq == (1 to 3), "ranks must be dense from 1")
    val ws = got.map(_.getDouble(5))
    assert(ws.zip(ws.tail).forall { case (a, b) => a >= b }, "weights non-increasing")
    assert(ws.forall(w => w > -1.0 && w < 1.0), "mean leaning is bounded in (-1, 1)")
  }

  test("q176 fixture run: k rows, dense ranks, no target-lang rows") {
    val got = Sampling.importanceResample(sf(), k = 50).collect()
    assert(got.length == 50)
    assert(got.map(_.getInt(0)).toSeq == (1 to 50))
    assert(got.forall(_.getString(3) != "en"))
  }

  // ── q177 collocations ───────────────────────────────────────────────

  test("q177: lift matches the hand formula; support floor cuts rare pairs") {
    // "new york" always adjacent (6x); "of the" frequent but predictable;
    // "rare pair" appears 4x — below the default minCount=5
    val ny = Seq.fill(6)("new york").mkString(" ")
    val t = docsTable(Seq(
      (0L, ny, "en", "s"),
      (1L, "of the of the of the of the of the of the", "en", "s"),
      (2L, "rare pair rare pair rare pair rare pair", "en", "s")))
    val rows = TextAnalysis.collocations(t, minCount = 5, k = 10).collect()
    val byBigram = rows.map(r => r.getString(1) -> r).toMap
    assert(!byBigram.contains("rare pair"), "minCount floor must cut the 4x pair")
    // hand counts: n1 = 12+12+8 = 32 tokens, n2 = 11+11+7 = 29 bigrams,
    // c12(new york)=6, c1(new)=6, c2(york)=6
    val expected = 6.0.toDouble * 32 / 6 / 6 * 32 / 29
    val gotLift = byBigram("new york").getDouble(5)
    assert(math.abs(gotLift - (math.rint(expected * 1e6) / 1e6)) < 1e-9,
      s"lift $gotLift != hand-computed $expected")
    // within-sentence adjacency: "york new" also occurs (5x) — lower lift
    // than "new york" (6x) at identical unigram counts
    assert(!byBigram.contains("york new") ||
      byBigram("york new").getDouble(5) < gotLift)
  }

  test("q177 fixture run: k rows, ranks dense, lift non-increasing, support >= floor") {
    val rows = TextAnalysis.collocations(sf(), minCount = 5, k = 20).collect()
    assert(rows.length == 20)
    assert(rows.map(_.getInt(0)).toSeq == (1 to 20))
    val lifts = rows.map(_.getDouble(5))
    assert(lifts.zip(lifts.tail).forall { case (a, b) => a >= b })
    assert(rows.forall(_.getLong(2) >= 5L))
  }

  // ── q178 JL distortion ──────────────────────────────────────────────

  test("q178: all C(nVecs,2) pairs accounted for; wider projections distort less") {
    def wMeanErr(kDims: Int): (Long, Double) = {
      val rows = Similarity.jlDistortion(sf(), kDims = kDims).collect()
      val n = rows.map(_.getLong(1)).sum
      val werr = rows.map(r => r.getLong(1) * r.getDouble(2)).sum / n
      (n, werr)
    }
    val (n16, e16) = wMeanErr(16)
    val (n4, e4) = wMeanErr(4)
    assert(n16 == 780L && n4 == 780L, "expected C(40,2) = 780 pairs in every band sum")
    assert(e16 < e4,
      s"16-dim projection ($e16) should preserve cosine better than 4-dim ($e4)")
  }

  test("q178: deterministic across invocations (hash-generated sign matrix)") {
    val a = Similarity.jlDistortion(sf()).collect().map(_.toSeq).toSeq
    val b = Similarity.jlDistortion(sf()).collect().map(_.toSeq).toSeq
    assert(a == b)
  }

  // ── q179 vocabulary growth ──────────────────────────────────────────

  test("q179: per-decile new-word and cumulative counts on a constructed corpus") {
    // 20 docs; doc i contributes its own word w<i> plus the shared word
    // "common" — so decile 0 introduces 3 words (w0, w1, common) and every
    // later decile exactly its 2 fresh ones
    val t = docsTable((0 until 20).map(i =>
      (i.toLong, s"w$i common", "en", "s")))
    val rows = TextAnalysis.vocabGrowth(t).collect()
    assert(rows.length == 10)
    assert(rows.map(_.getLong(0)).toSeq == (0L to 9L))
    assert(rows.map(_.getLong(3)).toSeq == Seq(3L) ++ Seq.fill(9)(2L))
    assert(rows.map(_.getLong(1)).toSeq == (1 to 10).map(_ * 2L)) // docs_cum
    assert(rows.map(_.getLong(2)).toSeq == (1 to 10).map(_ * 4L)) // tokens_cum
    assert(rows.last.getLong(4) == 21L) // vocab_cum = 20 + "common"
  }

  // ── q180 tokenizer fertility ────────────────────────────────────────

  test("q180: per-source roll-up reconciles with the per-doc q118 encode") {
    val t = sf()
    val got = graft.ext.Bpe.fertilityBySource(t).collect()
      .map(r => r.getString(0) -> r).toMap
    val enc = graft.ext.Bpe.bpeEncode(t)
      .join(t.documents.select(col("doc_id"), col("source")), Seq("doc_id"))
      .groupBy(col("source"))
      .agg(sum(col("n_words")).as("w"), sum(col("n_word_chars")).as("c"),
        sum(col("n_bpe_tokens")).as("tk"))
      .collect()
    assert(enc.nonEmpty && enc.length == got.size)
    for (r <- enc) {
      val g = got(r.getString(0))
      assert(g.getLong(2) == r.getLong(1), s"${r.getString(0)} words")
      assert(g.getLong(3) == r.getLong(2), s"${r.getString(0)} chars")
      assert(g.getLong(4) == r.getLong(3), s"${r.getString(0)} tokens")
      assert(g.getDouble(5) >= 1.0, "fertility is >= 1 token per word")
      assert(g.getDouble(6) >= 1.0, "BPE tokens never exceed chars")
    }
    assert(got.values.map(_.getLong(1)).sum == t.documents.count())
  }

  // ── q181 winnowing overlap ──────────────────────────────────────────

  test("q181: shared passages >= w+k-1 tokens are guaranteed detected") {
    // A/B identical; C shares an 8-token passage with A (>= w+k-1 = 6);
    // D shares nothing
    val passage = "one two three four five six seven eight"
    val t = docsTable(Seq(
      (0L, s"$passage alpha beta gamma", "en", "s"),
      (1L, s"$passage alpha beta gamma", "en", "s"),
      (2L, s"zz yy xx $passage ww vv", "en", "s"),
      (3L, "p q r s t u v w x y z pp qq rr ss tt", "en", "s")))
    val rows = TextAnalysis.winnowingOverlap(t, minShared = 1).collect()
    val pairs = rows.map(r => (r.getLong(0), r.getLong(1)) -> r).toMap
    assert(pairs.contains((0L, 1L)), "identical docs must pair")
    assert(pairs((0L, 1L)).getDouble(5) == 1.0, "identical docs overlap 1.0")
    assert(pairs.contains((0L, 2L)) && pairs.contains((1L, 2L)),
      "the shared 8-token passage must leave a common fingerprint (MOSS guarantee)")
    assert(!pairs.keySet.exists(p => p._1 == 3L || p._2 == 3L),
      "disjoint doc must not pair")
    assert(rows.forall(r => r.getLong(0) < r.getLong(1)))
  }

  test("q181 fixture run: full parity with a single-node winnowing replica") {
    val t = sf()
    val (k, w, dfCap, minShared) = (3, 4, 64, 2)
    val rows = TextAnalysis.winnowingOverlap(t, k, w, dfCap, minShared).collect()
    assert(rows.nonEmpty)
    assert(rows.forall(r => r.getDouble(5) > 0.0 && r.getDouble(5) <= 1.0))
    // single-node replica: tokenize, shingle-hash, window-min, df-cut,
    // pair-count — the whole recipe recomputed without Spark
    val p = 1000000007L
    val sel: Map[Long, Set[Long]] = t.documents
      .select(col("doc_id"), col("text")).collect()
      .map { r =>
        val tks = r.getString(1).trim.split("\\s+")
        val hs = (0 to tks.length - k).map(i =>
          tks.slice(i, i + k).foldLeft(0L)((acc, tk) =>
            (acc * 131 + (tk.headOption.map(_.toLong).getOrElse(0L) * 31
              + tk.length)) % p))
        val s =
          if (hs.length >= w) (0 to hs.length - w).map(j => hs.slice(j, j + w).min)
          else hs
        r.getLong(0) -> s.toSet
      }.filter(_._2.nonEmpty).toMap
    val df = sel.values.flatten.groupBy(identity).map { case (fp, o) => fp -> o.size }
    val ids = sel.keys.toSeq.sorted
    val expected = (for {
      a <- ids; b <- ids if a < b
      shared = sel(a).intersect(sel(b)).count(fp => df(fp) <= dfCap)
      if shared >= minShared
    } yield (a, b) -> (shared.toLong, sel(a).size.toLong, sel(b).size.toLong)).toMap
    val got = rows.map(r => (r.getLong(0), r.getLong(1)) ->
      (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(got == expected, s"pair sets differ: got=${got.size} exp=${expected.size}")
  }

  // ── q182 k-center coreset ───────────────────────────────────────────

  test("q182: distributed ≡ single-node integer greedy; radius covers") {
    val t = sf()
    val k = 8
    val vecs = t.embeddings.select(col("vec_id"), col("embedding")).collect()
      .map(r => (r.getLong(0),
        r.getSeq[Float](1).map(x =>
          java.math.BigDecimal.valueOf(x.toDouble * 1e6)
            .setScale(0, java.math.RoundingMode.HALF_UP).longValue()).toArray))
      .sortBy(_._1)
    def dist(a: Array[Long], b: Array[Long]): Long =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    // single-node greedy: seed = min id, then argmax of min-dist
    var sel = Vector((vecs.head._1, 0L))
    var mind = vecs.map(v => v._1 -> dist(v._2, vecs.head._2)).toMap - vecs.head._1
    for (_ <- 2 to k) {
      val (pid, pd) = mind.toSeq.maxBy { case (id, d) => (d, -id) }
      sel :+= ((pid, pd))
      val pv = vecs.find(_._1 == pid).get._2
      mind = (mind - pid).map { case (id, d) =>
        id -> math.min(d, dist(vecs.find(_._1 == id).get._2, pv)) }
    }
    val radius = mind.values.max
    val got = graft.ext.Spectral.kcenterCoreset(t, k).collect()
    assert(got.length == k)
    assert(got.map(_.getInt(0)).toSeq == (1 to k))
    assert(got.map(_.getLong(1)).toSeq == sel.map(_._1),
      "selection order must match the single-node greedy")
    def r6(x: Double): Double = java.math.BigDecimal.valueOf(x)
      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
    for ((r, (_, d)) <- got.zip(sel))
      assert(r.getDouble(3) == r6(d.toDouble / 1e12),
        s"rank ${r.getInt(0)} dist_sel mismatch")
    assert(got.forall(_.getDouble(4) == r6(radius.toDouble / 1e12)))
    // greedy contract: selection distances non-increasing from rank 2
    val ds = got.drop(1).map(_.getDouble(3))
    assert(ds.zip(ds.tail).forall { case (a, b) => b <= a + 1e-9 })
    assert(got.map(_.getLong(1)).distinct.length == k, "no re-selection")
  }

  // ── q183 cluster exemplars ──────────────────────────────────────────

  test("q183: ranks dense, distances sorted, counts reconcile with q175") {
    val t = sf()
    val (k, iters, m) = (8, 3, 3)
    val got = graft.ext.Spectral.clusterExemplars(t, k, iters, m).collect()
    val report = graft.ext.Spectral.kmeansReport(t, k, iters).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(3))).toMap
    val byCid = got.groupBy(_.getLong(0))
    assert(byCid.keySet == report.keySet, "every cluster must have exemplars")
    assert(got.map(_.getLong(2)).distinct.length == got.length, "no dup vecs")
    for ((cid, rows) <- byCid) {
      val (nMembers, meanDist) = report(cid)
      assert(rows.length == math.min(m.toLong, nMembers),
        s"cluster $cid exemplar count")
      assert(rows.map(_.getInt(1)).toSeq.sorted == (1 to rows.length),
        s"cluster $cid ranks not dense")
      val ds = rows.sortBy(_.getInt(1)).map(_.getDouble(4))
      assert(ds.zip(ds.tail).forall { case (a, b) => a <= b },
        s"cluster $cid distances not sorted")
      assert(ds.head <= meanDist + 1e-9,
        s"cluster $cid most-central exemplar above the cluster mean distance")
    }
  }

  // ── q184 snapshot drift ─────────────────────────────────────────────

  test("q184: identical snapshots drift 0; disjoint snapshots drift 1") {
    import spark.implicits._
    // which hash-split side each doc_id lands on (the query's own split)
    val sides = (0L until 16L).toDF("id")
      .select(col("id"),
        (pmod(Sampling.splitHash(col("id")), lit(2L)) === 0).as("v1"))
      .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    assert(sides.values.toSet.size == 2, "both snapshot sides populated")
    // all docs carry identical text → p1 == p2 in every bucket
    val same = docsTable((0L until 16L).map(i => (i, "alpha beta gamma", "en", "s")))
    val sameRows = TextAnalysis.snapshotDrift(same).collect()
    assert(sameRows.length == 1)
    assert(sameRows(0).getDouble(3) == 0.0 && sameRows(0).getDouble(4) == 0.0)
    // v1 docs speak only "evenword", v2 docs only "oddword" → disjoint
    // supports (the two words land in different hash buckets)
    val disj = docsTable((0L until 16L).map(i =>
      (i, if (sides(i)) "evenword evenword" else "oddword oddword", "en", "s")))
    val dRows = TextAnalysis.snapshotDrift(disj).collect()
    assert(dRows.length == 1)
    assert(dRows(0).getDouble(3) == 1.0, s"disjoint TV ${dRows(0).getDouble(3)}")
    assert(dRows(0).getDouble(4) == 1.0, s"disjoint Hellinger ${dRows(0).getDouble(4)}")
  }

  test("q184 fixture run: token conservation and [0,1] bounds per source") {
    val t = sf()
    val rows = TextAnalysis.snapshotDrift(t).collect()
    assert(rows.nonEmpty)
    val totals = t.documents
      .select(col("source"), size(TextAnalysis.tokens(lower(col("text"))))
        .cast("long").as("n"))
      .groupBy(col("source")).agg(sum(col("n")).as("n")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    for (r <- rows) {
      assert(r.getLong(1) + r.getLong(2) == totals(r.getString(0)),
        s"${r.getString(0)} token conservation")
      assert(r.getDouble(3) >= 0.0 && r.getDouble(3) <= 1.0)
      assert(r.getDouble(4) >= 0.0 && r.getDouble(4) <= 1.0)
    }
  }

  // ── q185 quality-signal correlation ─────────────────────────────────

  test("q185: all C(5,2) pairs, |corr| <= 1, parity with Spark's corr()") {
    val t = sf()
    val rows = TextAnalysis.qualitySignalCorr(t).collect()
    assert(rows.length == 10)
    assert(rows.forall(r => math.abs(r.getDouble(2)) <= 1.0 + 1e-12))
    assert(rows.map(_.getLong(3)).distinct.toSeq == Seq(t.documents.count()))
    // independent recompute: Spark's built-in corr over the same signals
    val tks = TextAnalysis.tokens(col("text"))
    val sig = t.documents.select(
      size(tks).cast("double").as("n_tokens"),
      round(size(array_distinct(tks)).cast("double") / size(tks), 6)
        .as("distinct_ratio"))
    val expected = sig.agg(corr(col("n_tokens"), col("distinct_ratio")))
      .collect()(0).getDouble(0)
    val gotPair = rows.find(r =>
      r.getString(0) == "n_tokens" && r.getString(1) == "distinct_ratio").get
    assert(math.abs(gotPair.getDouble(2) - expected) < 1e-3,
      s"exact-decimal corr ${gotPair.getDouble(2)} vs Spark corr $expected")
  }

  test("q179 fixture run: totals reconcile with direct distinct/token counts") {
    val t = sf()
    val rows = TextAnalysis.vocabGrowth(t).collect()
    assert(rows.length == 10)
    val tks = TextAnalysis.tokens(lower(col("text")))
    val vocab = t.documents.select(explode(tks).as("tok"))
      .agg(countDistinct(col("tok"))).collect()(0).getLong(0)
    val toks = t.documents.select(size(tks).cast("long").as("n"))
      .agg(sum(col("n"))).collect()(0).getLong(0)
    assert(rows.last.getLong(4) == vocab, "final vocab_cum must equal countDistinct")
    assert(rows.last.getLong(2) == toks, "final tokens_cum must equal total tokens")
    assert(rows.last.getLong(1) == t.documents.count())
    // monotone curves
    def mono(i: Int) = { val c = rows.map(_.getLong(i)); c.zip(c.tail).forall { case (a, b) => a <= b } }
    assert(mono(1) && mono(2) && mono(4))
  }
}
