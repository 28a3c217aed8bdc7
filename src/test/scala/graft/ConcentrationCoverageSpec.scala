package graft

import graft.ext.TextAnalysis
import graft.operators.{DataQuality, NonparametricStats}
import org.apache.spark.sql.functions._

/** Contracts for the q215–q217 wave: Gini token-mass concentration, Chao1
  * vocabulary richness, and rank-biased overlap — each pinned bit-for-bit
  * against a full single-node Scala replica. */
class ConcentrationCoverageSpec extends SparkSpec {

  private def bits(d: Double): Long = java.lang.Double.doubleToLongBits(d)

  private def docs(t: graft.core.Tables): Seq[(String, Long, String)] =
    t.documents.select(col("source"), col("doc_id"), col("text"),
        col("n_chars")).collect()
      .map(r => (r.getAs[String]("source"), r.getAs[Long]("doc_id"),
        r.getAs[String]("text"))).toSeq

  private def nTokens(text: String): Long =
    text.trim.split("\\s+").length.toLong

  test("q215: replica parity — sorted-moment Gini, decile share; bounds") {
    val t = sf("sf0.01")
    val expected = docs(t).groupBy(_._1).map { case (src, g) =>
      val ws = g.map(d => (nTokens(d._3), d._2)).sortBy(identity)
      val n = ws.length.toLong
      val tot = ws.map(_._1).sum
      val siw = ws.zipWithIndex.map { case ((w, _), i) => (i + 1) * w }.sum
      val topN = n - n / 10
      val wTop = ws.zipWithIndex.collect {
        case ((w, _), i) if (i + 1).toLong > topN => w
      }.sum
      (src, n, tot, wTop, bits(wTop.toDouble / tot.toDouble),
        bits((2 * siw - (n + 1) * tot).toDouble / (n * tot).toDouble))
    }.toSet
    val actual = DataQuality.giniConcentration(t).collect()
      .map(r => (r.getAs[String]("source"), r.getAs[Long]("n_docs"),
        r.getAs[Long]("total_tokens"), r.getAs[Long]("w_top_decile"),
        bits(r.getAs[Double]("top_decile_share")),
        bits(r.getAs[Double]("gini")))).toSet
    assert(actual == expected)
    // Gini lives in [0, 1) and the top decile holds at least its pro-rata
    // tenth of the mass
    actual.foreach { case (_, _, _, _, shareB, gB) =>
      val g = java.lang.Double.longBitsToDouble(gB)
      val share = java.lang.Double.longBitsToDouble(shareB)
      assert(g >= 0.0 && g < 1.0 && share >= 0.09)
    }
  }

  test("q216: replica parity — counts-of-counts, Chao1 and coverage bits") {
    val t = sf("sf0.001")
    val expected = docs(t)
      .flatMap(d => d._3.trim.toLowerCase.split("\\s+").map(d._1 -> _))
      .groupBy(identity).map { case ((s, tk), g) => (s, tk, g.length.toLong) }
      .groupBy(_._1).map { case (src, vocab) =>
        val sObs = vocab.size.toLong
        val n = vocab.map(_._3).sum
        val f1 = vocab.count(_._3 == 1L).toLong
        val f2 = vocab.count(_._3 == 2L).toLong
        (src, sObs, n, f1, f2,
          bits((n - f1).toDouble / n.toDouble),
          bits(sObs.toDouble + (f1 * (f1 - 1)).toDouble / (2.0 * (f2 + 1).toDouble)))
      }.toSet
    val actual = TextAnalysis.vocabRichness(t).collect()
      .map(r => (r.getAs[String]("source"), r.getAs[Long]("s_obs"),
        r.getAs[Long]("n_tokens"), r.getAs[Long]("f1"), r.getAs[Long]("f2"),
        bits(r.getAs[Double]("coverage_gt")),
        bits(r.getAs[Double]("chao1")))).toSet
    assert(actual == expected)
    // the estimate can only add unseen species
    actual.foreach { case (_, sObs, _, _, _, _, chaoB) =>
      assert(java.lang.Double.longBitsToDouble(chaoB) >= sObs.toDouble)
    }
  }

  test("q217: replica parity — overlap-at-depth counts and the fixed-order RBO chain") {
    val t = sf("sf0.001")
    val perDoc = t.documents.select(col("source"), col("doc_id"), col("text"),
        col("n_chars")).collect()
      .map(r => (r.getAs[String]("source"), r.getAs[Long]("doc_id"),
        nTokens(r.getAs[String]("text")), r.getAs[Long]("n_chars")))
    val expected = perDoc.groupBy(_._1).map { case (src, g) =>
      val ra = g.sortBy(d => (-d._3, d._2)).zipWithIndex
        .map { case (d, i) => d._2 -> (i + 1L) }.toMap
      val rb = g.sortBy(d => (-d._4, d._2)).zipWithIndex
        .map { case (d, i) => d._2 -> (i + 1L) }.toMap
      val m = g.map(d => math.max(ra(d._2), rb(d._2)))
      val ov = (1 to 20).map(d => m.count(_ <= d).toLong)
      val rbo = (1 to 20).map(d => math.pow(0.5, d) / d * ov(d - 1).toDouble)
        .reduceLeft(_ + _)
      (src, g.length.toLong, ov(9), ov(19), bits(rbo))
    }.toSet
    val actual = NonparametricStats.rbo(t).collect()
      .map(r => (r.getAs[String]("source"), r.getAs[Long]("n_docs"),
        r.getAs[Long]("overlap_at_half"), r.getAs[Long]("overlap_at_k"),
        bits(r.getAs[Double]("rbo")))).toSet
    assert(actual == expected)
    // identical rankings would give RBO = 1 − 2^−K; disagreement only
    // subtracts, so every source sits in (0, 1]
    actual.foreach { case (_, _, _, _, rboB) =>
      val v = java.lang.Double.longBitsToDouble(rboB)
      assert(v > 0.0 && v <= 1.0)
    }
  }
}
