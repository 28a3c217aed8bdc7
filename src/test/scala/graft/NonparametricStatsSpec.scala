package graft

import graft.operators.NonparametricStats
import org.apache.spark.sql.functions._

/** Contracts for the q212–q214 wave: Mann–Whitney U, the two-sample KS
  * distance, and Cohen's kappa — each pinned bit-for-bit against a full
  * single-node Scala replica (ranks, ECDFs, and confusion marginals
  * recomputed from first principles, not via the operator's own frames). */
class NonparametricStatsSpec extends SparkSpec {

  private def bits(d: Double): Long = java.lang.Double.doubleToLongBits(d)

  private def splitHashLong(x: Long): Long = {
    val m = graft.functions.KmvSketch.M
    val h = Math.floorMod(Math.floorMod(x, m) * 2654435761L, m)
    Math.floorMod(Math.floorMod(h * h, m) * 2246822519L + 1L, m)
  }

  private def isControl(u: Long): Boolean = splitHashLong(u) % 2 == 0

  private def armedEvents(t: graft.core.Tables): Seq[(String, Double, Boolean)] =
    t.events.filter(col("value").isNotNull)
      .select(col("event_type"), col("value"), col("user_id")).collect()
      .map(r => (r.getAs[String]("event_type"), r.getAs[Double]("value"),
        isControl(r.getAs[Long]("user_id")))).toSeq

  test("q212: replica parity — tie-averaged ranks, exact 2U, AUC and z bits") {
    val t = sf("sf0.01")
    val expected = armedEvents(t).groupBy(_._1).map { case (et, rows) =>
      val n = rows.length.toLong
      // 2·avgrank for value v = 2·(#strictly-less) + count(v) + 1
      val byV = rows.groupBy(_._2).view.mapValues(_.length.toLong).toMap
      val sortedV = byV.keys.toSeq.sorted
      val less = sortedV.zip(sortedV.scanLeft(0L)((acc, v) => acc + byV(v)))
        .toMap // value -> #strictly-less
      val s2t = rows.filter(!_._3)
        .map(r => 2 * less(r._2) + byV(r._2) + 1).sum
      val nT = rows.count(!_._3).toLong
      val nC = n - nT
      val tie3 = byV.values.map(c => c * c * c - c).sum
      val u2 = s2t - nT * (nT + 1)
      val auc = u2.toDouble / (2.0 * nT.toDouble * nC.toDouble)
      val z = ((u2 - nT * nC).toDouble / 2.0) /
        math.sqrt(nT.toDouble * nC.toDouble / 12.0 *
          ((n + 1).toDouble - tie3.toDouble / (n.toDouble * (n - 1).toDouble)))
      (et, nC, nT, u2, bits(auc), bits(z))
    }.toSet
    val actual = NonparametricStats.mannWhitney(t).collect()
      .map(r => (r.getAs[String]("event_type"), r.getAs[Long]("n_control"),
        r.getAs[Long]("n_treatment"), r.getAs[Long]("u2_treatment"),
        bits(r.getAs[Double]("auc_treatment")),
        bits(r.getAs[Double]("z_treatment")))).toSet
    assert(actual == expected)
    // AUC is a probability; the hash split should keep it near 1/2
    val aucs = actual.toSeq.map(x => java.lang.Double.longBitsToDouble(x._5))
    assert(aucs.forall(a => a > 0.3 && a < 0.7), s"AUCs far from null: $aucs")
  }

  test("q213: replica parity — integer ECDF gap, argmax location, D bits") {
    val t = sf("sf0.01")
    val expected = armedEvents(t).groupBy(_._1).map { case (et, rows) =>
      val nC = rows.count(_._3).toLong
      val nT = rows.length - nC
      val byV = rows.groupBy(_._2).view
        .mapValues(g => (g.count(_._3).toLong, g.count(!_._3).toLong)).toMap
      var f1 = 0L; var f2 = 0L
      val cum = byV.keys.toSeq.sorted.map { v =>
        f1 += byV(v)._1; f2 += byV(v)._2
        (v, math.abs(f1 * nT - f2 * nC))
      }
      val dMax = cum.map(_._2).max
      val at = cum.filter(_._2 == dMax).map(_._1).min
      (et, nC, nT, dMax, bits(dMax.toDouble / (nC.toDouble * nT.toDouble)), at)
    }.toSet
    val actual = NonparametricStats.ksTest(t).collect()
      .map(r => (r.getAs[String]("event_type"), r.getAs[Long]("n_control"),
        r.getAs[Long]("n_treatment"), r.getAs[Long]("d_num"),
        bits(r.getAs[Double]("ks_d")), r.getAs[Double]("at_value"))).toSet
    assert(actual == expected)
  }

  test("q214: replica parity — confusion marginals, integer kappa ratio") {
    val t = sf("sf0.001")
    def occ(text: String, marker: String): Int = {
      val padded = s" $text "
      val needle = s" $marker "
      (padded.length - padded.replace(needle, "").length) / needle.length
    }
    val perDoc = t.documents.select(col("source"), col("lang"), col("text"))
      .collect().map { r =>
        val text = r.getAs[String]("text")
        val (en, fr, es) =
          (occ(text, "the"), occ(text, "table"), occ(text, "data"))
        val pred = if (en >= fr && en >= es) "en"
          else if (fr >= es) "fr" else "es"
        (r.getAs[String]("source"), r.getAs[String]("lang"), pred)
      }
    val expected = perDoc.groupBy(_._1).map { case (src, g) =>
      val n = g.length.toLong
      val agree = g.count(x => x._2 == x._3).toLong
      val rowm = g.groupBy(_._2).view.mapValues(_.length.toLong).toMap
      val colm = g.groupBy(_._3).view.mapValues(_.length.toLong).toMap
      val pem = rowm.keys.map(l => rowm(l) * colm.getOrElse(l, 0L)).sum
      (src, n, agree, bits(agree.toDouble / n.toDouble),
        bits(pem.toDouble / (n.toDouble * n.toDouble)),
        bits((n * agree - pem).toDouble / (n * n - pem).toDouble))
    }.toSet
    val actual = NonparametricStats.kappa(t).collect()
      .map(r => (r.getAs[String]("source"), r.getAs[Long]("n_docs"),
        r.getAs[Long]("n_agree"), bits(r.getAs[Double]("p_observed")),
        bits(r.getAs[Double]("p_expected")),
        bits(r.getAs[Double]("kappa")))).toSet
    assert(actual == expected)
    // kappa must sit in [-1, 1] and below raw agreement (chance correction)
    actual.foreach { case (_, _, _, poB, _, kB) =>
      val po = java.lang.Double.longBitsToDouble(poB)
      val k = java.lang.Double.longBitsToDouble(kB)
      assert(k >= -1.0 && k <= 1.0 && k <= po)
    }
  }
}
