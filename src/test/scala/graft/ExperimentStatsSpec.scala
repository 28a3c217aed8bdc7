package graft

import graft.ext.FuzzyJoin
import graft.operators.RobustStats
import org.apache.spark.sql.functions._

/** Contracts for the q199-q202 wave: Fellegi-Sunter linkage, CUPED,
  * trimmed/winsorized means, Spearman rank correlation. */
class ExperimentStatsSpec extends SparkSpec {

  private def bits(d: Double): Long = java.lang.Double.doubleToLongBits(d)

  // ── q199 Fellegi-Sunter ───────────────────────────────────────────────

  private def fsReplica(t: graft.core.Tables, cap: Int)
      : Set[(Long, Long, Long, String)] = {
    val m = graft.functions.KmvSketch.M
    def sh(x: Long): Long = {
      val h = Math.floorMod(Math.floorMod(x, m) * 2654435761L, m)
      Math.floorMod(Math.floorMod(h * h, m) * 2246822519L + 1L, m)
    }
    val parts = t.part.select(col("p_partkey"), col("p_brand"), col("p_size"),
        col("p_type"), col("p_name"), col("p_retailprice")).collect()
      .map(r => (r.getAs[Long]("p_partkey"), r.getAs[String]("p_brand"),
        r.getAs[Int]("p_size"), r.getAs[String]("p_type"),
        r.getAs[String]("p_name").split(" ").head,
        math.floor(r.getAs[Double]("p_retailprice") / 100.0).toLong))
    val n = parts.length.toLong
    // the salt cap: blocks split into ceil(n/cap) hash sub-blocks
    val blockN = parts.groupBy(p => (p._2, p._3)).view.mapValues(_.length.toLong).toMap
    def salt(p: (Long, String, Int, String, String, Long)): Long =
      sh(p._1) % ((blockN((p._2, p._3)) + cap - 1) / cap)
    def u(f: ((Long, String, Int, String, String, Long)) => Any): (Long, Long) = {
      val counts = parts.groupBy(f).map(_._2.length.toLong)
      (counts.map(c => c * c).sum, n * n)
    }
    val (utN, utD) = u(_._4); val (usN, usD) = u(_._5); val (ubN, ubD) = u(_._6)
    def ratio(agree: Boolean, num: Long, den: Long): Double =
      if (agree) (90L * den).toDouble / (100L * num).toDouble
      else (10L * den).toDouble / (100L * (den - num)).toDouble
    (for {
      a <- parts; b <- parts
      if a._2 == b._2 && a._3 == b._3 && salt(a) == salt(b) && a._1 < b._1
    } yield {
      val r = ratio(a._4 == b._4, utN, utD) * ratio(a._5 == b._5, usN, usD) *
        ratio(a._6 == b._6, ubN, ubD)
      val verdict = if (r >= 30.0) "match" else if (r >= 1.0) "possible" else "nonmatch"
      (a._1, b._1, bits(r), verdict)
    }).toSet
  }

  test("q199: single-node replica parity — blocked pairs, u-tables, ratios, verdicts") {
    val t = sf("sf0.01")
    val expected = fsReplica(t, cap = 64)
    val actual = FuzzyJoin.fellegiSunter(t).collect()
      .map(r => (r.getAs[Long]("key_a"), r.getAs[Long]("key_b"),
        bits(r.getAs[Double]("fs_ratio")), r.getAs[String]("verdict"))).toSet
    assert(actual == expected)
    assert(actual.exists(_._4 == "match"), "no pair classified as match")
    assert(actual.exists(_._4 == "nonmatch"), "no pair classified as nonmatch")
  }

  test("q199: salt cap bounds oversized blocks and the engine replays it") {
    val t = sf("sf0.01")
    val expected = fsReplica(t, cap = 2)
    val actual = FuzzyJoin.fellegiSunter(t, blockCap = 2).collect()
      .map(r => (r.getAs[Long]("key_a"), r.getAs[Long]("key_b"),
        bits(r.getAs[Double]("fs_ratio")), r.getAs[String]("verdict"))).toSet
    assert(actual == expected)
    // the tight cap must actually drop cross-sub-block pairs
    assert(actual.size < fsReplica(t, cap = 64).size)
  }

  test("q199: agreement monotonicity — more field agreement never lowers the ratio") {
    val rows = FuzzyJoin.fellegiSunter(sf("sf0.01")).collect()
    val byAgree = rows.groupBy(r => r.getAs[Int]("agree_type") +
      r.getAs[Int]("agree_stem") + r.getAs[Int]("agree_band"))
      .map { case (k, g) => k -> g.map(_.getAs[Double]("fs_ratio")) }
    for (k <- byAgree.keys; j <- byAgree.keys if k < j)
      assert(byAgree(k).max <= byAgree(j).min * 1e6,
        s"ratio ranges for agree-count $k and $j are wildly inverted")
    // full agreement always beats full disagreement
    if (byAgree.contains(3) && byAgree.contains(0))
      assert(byAgree(3).min > byAgree(0).max)
  }

  // ── q200 CUPED ────────────────────────────────────────────────────────

  private def dsumReplica(vs: Seq[Double]): Double = {
    val ps = vs.map(v => BigDecimal(v * 1000000)
      .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong)
    (ps.map(_ >> 26).sum.toDouble * 67108864.0 +
      ps.map(_ & 67108863L).sum.toDouble) / 1000000.0
  }

  test("q200: theta matches the pooled cov/var replica; arms partition users") {
    val t = sf("sf0.01")
    val m = graft.functions.KmvSketch.M
    def splitHash(x: Long): Long = {
      val h = Math.floorMod(Math.floorMod(x, m) * 2654435761L, m)
      Math.floorMod(Math.floorMod(h * h, m) * 2246822519L + 1L, m)
    }
    val ev = t.events.filter(col("value").isNotNull)
      .select(col("user_id"), dayofmonth(col("ts")).as("d"), col("value"))
      .collect().map(r => (r.getAs[Long]("user_id"), r.getAs[Int]("d"),
        r.getAs[Double]("value")))
    val perUser = ev.groupBy(_._1).map { case (uid, g) =>
      (uid, dsumReplica(g.toSeq.map(e => if (e._2 <= 15) e._3 else 0.0)),
        dsumReplica(g.toSeq.map(e => if (e._2 > 15) e._3 else 0.0)))
    }.toSeq
    def cents(v: Double): Long = BigDecimal(v * 100)
      .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
    def dsumProd(xs: Seq[(Double, Double)]): Double = {
      val ps = xs.map { case (x, y) => cents(x) * cents(y) }
      (ps.map(_ >>> 26).sum.toDouble * 67108864.0 +
        ps.map(_ & 67108863L).sum.toDouble) / 10000.0
    }
    val np = perUser.length.toDouble
    val sx = dsumReplica(perUser.map(_._2)); val sy = dsumReplica(perUser.map(_._3))
    val sxy = dsumProd(perUser.map(u => (u._2, u._3)))
    val sxx = dsumProd(perUser.map(u => (u._2, u._2)))
    val expTheta = (np * sxy - sx * sy) / (np * sxx - sx * sx)
    val rows = RobustStats.cuped(t).collect()
    assert(rows.length == 2)
    for (r <- rows)
      assert(bits(r.getAs[Double]("theta")) == bits(expTheta), "theta drifted")
    val expArms = perUser.groupBy(u => if (splitHash(u._1) % 2 == 0) "control"
      else "treatment").view.mapValues(_.size.toLong).toMap
    for (r <- rows)
      assert(r.getAs[Long]("n_users") == expArms(r.getAs[String]("arm")))
  }

  test("q200: pooled variance strictly drops (the CUPED identity); arms stay close") {
    // var(Y - theta*X) = var(Y) - cov^2/var(X) <= var(Y) holds EXACTLY for
    // the pooled frame with the pooled OLS theta; per ARM it is only
    // approximate (theta is fit pooled, deliberately), so the per-arm
    // check carries a tolerance.
    val rows = RobustStats.cuped(sf("sf0.01")).collect()
    val nTot = rows.map(_.getAs[Long]("n_users")).sum.toDouble
    // pooled second moments reconstructed from per-arm mean/variance
    def pooled(mean: String, variance: String): Double = {
      val ex = rows.map(r => r.getAs[Long]("n_users") * r.getAs[Double](mean)).sum / nTot
      val exx = rows.map(r => r.getAs[Long]("n_users") *
        (r.getAs[Double](variance) + r.getAs[Double](mean) * r.getAs[Double](mean))).sum / nTot
      exx - ex * ex
    }
    assert(pooled("mean_y_adj", "var_y_adj") < pooled("mean_y", "var_y"),
      "pooled CUPED variance did not drop")
    for (r <- rows) {
      assert(r.getAs[Double]("var_y_adj") <= r.getAs[Double]("var_y") * 1.01,
        s"arm ${r.getAs[String]("arm")}: adjusted variance drifted far above raw")
      assert(!r.getAs[Double]("mean_y_adj").isNaN)
    }
  }

  // ── q201 trimmed/winsorized means ─────────────────────────────────────

  test("q201: robust means sit inside the tail edges; trimming keeps the bulk") {
    val rows = RobustStats.trimmedMeans(sf("sf0.01")).collect()
    assert(rows.nonEmpty)
    for (r <- rows) {
      val p10 = r.getAs[Double]("p10"); val p90 = r.getAs[Double]("p90")
      assert(p10 < p90)
      val tm = r.getAs[Double]("mean_trimmed")
      val wm = r.getAs[Double]("mean_winsorized")
      assert(tm >= p10 && tm <= p90, s"trimmed mean $tm outside [$p10,$p90]")
      assert(wm >= p10 && wm <= p90, s"winsorized mean $wm outside [$p10,$p90]")
      val n = r.getAs[Long]("n"); val nw = r.getAs[Long]("n_within")
      assert(nw >= (n * 6) / 10 && nw <= n,
        s"trim kept $nw of $n — grid edges degenerate")
    }
  }

  // ── q202 Spearman ─────────────────────────────────────────────────────

  test("q202: fractional-tie rank replica parity and range contract") {
    val t = sf("sf0.001")
    val docs = t.documents.select(col("source"), col("doc_id"), col("text"),
        col("n_chars")).collect()
      .map(r => (r.getAs[String]("source"), r.getAs[Long]("doc_id"),
        r.getAs[String]("text"), r.getAs[Long]("n_chars")))
    def ranks2(vs: Seq[Long]): Seq[Long] =
      // 2*average-rank with tie averaging: a tied run spans positions
      // [count(<v)+1, count(<=v)], and 2*avg = first + last
      vs.map(v => (vs.count(_ < v) + 1L) + vs.count(_ <= v))
    val bySource = docs.groupBy(_._1)
    val expected = bySource.map { case (src, g) =>
      val tok = g.map(_._3.trim.toLowerCase.split("\\s+").length.toLong).toSeq
      val chr = g.map(_._4).toSeq
      val n = g.length.toDouble
      val rt = ranks2(tok)
      val rc = ranks2(chr)
      val st = rt.sum; val sc = rc.sum
      val stc = rt.zip(rc).map { case (a, b) => a * b }.sum
      val stt = rt.map(a => a * a).sum; val scc = rc.map(a => a * a).sum
      val rho = (n * stc.toDouble - st.toDouble * sc.toDouble) /
        (math.sqrt(n * stt.toDouble - st.toDouble * st.toDouble) *
          math.sqrt(n * scc.toDouble - sc.toDouble * sc.toDouble))
      src -> rho
    }
    val rows = RobustStats.spearman(t).collect()
    for (r <- rows) {
      val rho = r.getAs[Double]("rho_tokens_chars")
      assert(bits(rho) == bits(expected(r.getAs[String]("source"))),
        s"source ${r.getAs[String]("source")} replica mismatch")
      for (c <- Seq("rho_tokens_chars", "rho_tokens_distinct", "rho_chars_distinct")) {
        val v = r.getAs[Double](c)
        assert(v >= -1.0000001 && v <= 1.0000001, s"$c out of range: $v")
      }
      // longer docs have more chars — strongly monotone by construction
      assert(rho > 0.5, s"tokens/chars rank correlation implausibly low: $rho")
    }
  }
}
