package graft

import graft.operators.{Analytics, RobustStats}
import org.apache.spark.sql.functions._

/** Contracts for the q218–q220 wave: cohort retention, post-stratified
  * arm means, and the hash-dealt permutation test. Retention is replayed
  * from the raw (user, week) pairs; the two estimators from first
  * principles with the micro-unit dsum replica. */
class CohortExperimentSpec extends SparkSpec {

  private def bits(d: Double): Long = java.lang.Double.doubleToLongBits(d)

  private def splitHashLong(x: Long): Long = {
    val m = graft.functions.KmvSketch.M
    val h = Math.floorMod(Math.floorMod(x, m) * 2654435761L, m)
    Math.floorMod(Math.floorMod(h * h, m) * 2246822519L + 1L, m)
  }

  private def dsumReplica(vs: Seq[Double]): Double = {
    val ps = vs.map(v => BigDecimal(v * 1000000)
      .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong)
    (ps.map(_ >> 26).sum.toDouble * 67108864.0 +
      ps.map(_ & 67108863L).sum.toDouble) / 1000000.0
  }

  test("q218: replica parity — strict-order stage recursion, conversions") {
    val t = sf("sf0.01")
    val ev = t.events.select(col("user_id"), col("event_type"), col("ts"))
      .collect()
      .map { r =>
        val ts = r.getAs[java.sql.Timestamp]("ts")
        // micros, not millis: strict `>` must see the full precision
        (r.getAs[Long]("user_id"), r.getAs[String]("event_type"),
          Math.floorDiv(ts.getTime, 1000L) * 1000000L + ts.getNanos / 1000L)
      }
    val steps = Seq("view", "click", "purchase")
    // t_k(u) = min ts of step k strictly after t_{k-1}(u)
    val stages = steps.tail.scanLeft(
      ev.filter(_._2 == steps.head).groupBy(_._1).view
        .mapValues(_.map(_._3).min).toMap) { (prev, step) =>
      ev.filter(e => e._2 == step && prev.contains(e._1) && e._3 > prev(e._1))
        .groupBy(_._1).view.mapValues(_.map(_._3).min).toMap
    }
    val ns = stages.map(_.size.toLong)
    val expected = steps.indices.map { i =>
      val prev = if (i == 0) 1.0 else ns(i).toDouble / ns(i - 1).toDouble
      (i + 1, steps(i), ns(i), bits(prev),
        bits(ns(i).toDouble / ns(0).toDouble))
    }.toSet
    val actual = Analytics.funnel(t).collect()
      .map(r => (r.getAs[Int]("step_idx"), r.getAs[String]("step"),
        r.getAs[Long]("n_users"), bits(r.getAs[Double]("conv_from_prev")),
        bits(r.getAs[Double]("conv_from_start")))).toSet
    assert(actual == expected)
    // stage populations shrink monotonically
    assert(ns == ns.sorted.reverse && ns.head > 0)
  }

  private def perUserEvents(t: graft.core.Tables): Seq[(Long, String, Double)] =
    t.events.filter(col("value").isNotNull)
      .select(col("user_id"), col("event_type"), col("value")).collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[String]("event_type"),
        r.getAs[Double]("value"))).toSeq

  test("q219: replica parity — stratum cells, population reweighting") {
    val t = sf("sf0.01")
    val rows = perUserEvents(t)
    val cells = rows.groupBy(r => (r._2, splitHashLong(r._1) % 2 == 0))
      .map { case ((et, ctl), g) =>
        (et, if (ctl) "control" else "treatment", g.length.toLong,
          dsumReplica(g.map(_._3)))
      }.toSeq
    val nS = cells.groupBy(_._1).view.mapValues(_.map(_._3).sum).toMap
    val nPop = nS.values.sum
    val expected = cells.groupBy(_._2).map { case (arm, g) =>
      val nArm = g.map(_._3).sum
      val meanRaw = dsumReplica(g.map(_._4)) / nArm.toDouble
      val terms = g.map(c =>
        (nS(c._1).toDouble * (c._4 / c._3.toDouble)) / nPop.toDouble)
      (arm, nArm, bits(meanRaw), bits(dsumReplica(terms)))
    }.toSet
    val actual = RobustStats.postStratified(t).collect()
      .map(r => (r.getAs[String]("arm"), r.getAs[Long]("n_events"),
        bits(r.getAs[Double]("mean_raw")),
        bits(r.getAs[Double]("mean_poststrat")))).toSet
    assert(actual == expected)
  }

  test("q220: replica parity — hash-dealt permutations, exact extreme count") {
    val t = sf("sf0.01")
    val perUser = perUserEvents(t).groupBy(_._1).view
      .mapValues(g => dsumReplica(g.toSeq.map(_._3))).toMap.toSeq
    // observed split
    val (ctlO, _) = perUser.partition(u => splitHashLong(u._1) % 2 == 0)
    val sC = dsumReplica(perUser.map(u => if (splitHashLong(u._1) % 2 == 0) u._2 else 0.0))
    val sT = dsumReplica(perUser.map(u => if (splitHashLong(u._1) % 2 == 0) 0.0 else u._2))
    val n = perUser.size.toLong
    val nC = ctlO.size.toLong
    val diffObs = sT / (n - nC).toDouble - sC / nC.toDouble
    val diffs = (0 until 64).map { b =>
      def ctl(u: Long): Boolean = splitHashLong(u * 64 + b) % 2 == 0
      val nCb = perUser.count(u => ctl(u._1)).toLong
      val sCb = dsumReplica(perUser.map(u => if (ctl(u._1)) u._2 else 0.0))
      val sTb = dsumReplica(perUser.map(u => if (ctl(u._1)) 0.0 else u._2))
      sTb / (n - nCb).toDouble - sCb / nCb.toDouble
    }
    val nExtreme = diffs.count(d => math.abs(d) >= math.abs(diffObs)).toLong
    val expected = (n, bits(diffObs), 64L, nExtreme,
      bits((nExtreme + 1).toDouble / 65.toDouble))
    val r = RobustStats.permutationTest(t).collect().head
    val actual = (r.getAs[Long]("n_users"), bits(r.getAs[Double]("diff_obs")),
      r.getAs[Long]("n_perms"), r.getAs[Long]("n_extreme"),
      bits(r.getAs[Double]("p_value")))
    assert(actual == expected)
    // the add-one p-value is bounded away from both ends by construction
    val p = java.lang.Double.longBitsToDouble(actual._5)
    assert(p >= 1.0 / 65.0 && p <= 1.0)
  }

  test("q221: replica parity — Wilson interval bits; brackets the estimate") {
    val t = sf("sf0.01")
    val rows = t.events.select(col("event_type"), col("value")).collect()
      .map(r => (r.getAs[String]("event_type"), !r.isNullAt(1)))
    val z = 1.96
    val expected = rows.groupBy(_._1).map { case (et, g) =>
      val n = g.length.toLong
      val x = g.count(_._2).toLong
      val nd = n.toDouble
      val phat = x.toDouble / nd
      val zz = z * z
      val denom = 1.0 + zz / nd
      val center = (phat + zz / (2.0 * nd)) / denom
      val half = (z / denom) *
        math.sqrt(phat * (1.0 - phat) / nd + zz / (4.0 * nd * nd))
      (et, n, x, bits(phat), bits(center - half), bits(center + half))
    }.toSet
    val actual = RobustStats.wilsonCompleteness(t).collect()
      .map(r => (r.getAs[String]("event_type"), r.getAs[Long]("n"),
        r.getAs[Long]("x"), bits(r.getAs[Double]("p_hat")),
        bits(r.getAs[Double]("ci_lo")), bits(r.getAs[Double]("ci_hi")))).toSet
    assert(actual == expected)
    actual.foreach { case (_, _, _, pB, loB, hiB) =>
      val (ph, lo, hi) = (java.lang.Double.longBitsToDouble(pB),
        java.lang.Double.longBitsToDouble(loB),
        java.lang.Double.longBitsToDouble(hiB))
      // at p̂ = 1 the limits land an ulp past the boundary in FP — every
      // containment check carries an ulp-scale tolerance
      assert(lo <= hi && lo >= -1e-12 && hi <= 1.0 + 1e-12 &&
        lo - 1e-12 <= ph && ph <= hi + 1e-12)
    }
  }

  test("q222: replica parity — per-seed deals; the house hash shows no SRM") {
    val t = sf("sf0.01")
    val users = t.events.select(col("user_id")).distinct().collect()
      .map(_.getAs[Long]("user_id"))
    val expected = (0 until 16).map { s =>
      val nC = users.count(u => splitHashLong(u * 16 + s) % 2 == 0).toLong
      val n = users.length.toLong
      val zv = (2 * nC - n).toDouble / math.sqrt(n.toDouble)
      (s, n, nC, bits(zv), math.abs(zv) >= 3.0)
    }.toSet
    val actual = RobustStats.srmSweep(t).collect()
      .map(r => (r.getAs[Int]("seed"), r.getAs[Long]("n_users"),
        r.getAs[Long]("n_control"), bits(r.getAs[Double]("z_srm")),
        r.getAs[Boolean]("srm_flag"))).toSet
    assert(actual == expected)
    // the portable hash must pass its own launch checklist on the fixture
    assert(actual.forall(!_._5), "splitHash family shows SRM on a seed")
  }
}
