package graft

import graft.operators.{DataQuality, RobustStats}
import org.apache.spark.sql.functions._

/** Contracts for the q206-q208 wave: Benford audit, k-anonymity,
  * token-weighted length quantiles. */
class DataGovernanceSpec extends SparkSpec {

  test("q206: leading-digit replica parity; observed shares partition to one") {
    val t = sf("sf0.01")
    val vals = t.events.filter(col("value").isNotNull).select(col("value"))
      .collect().map(_.getDouble(0)).filter(v => v >= 1.0 && v < 1e6)
    val expected = vals.groupBy { v =>
      val mag = Seq(1e5, 1e4, 1e3, 1e2, 1e1, 1e0).find(p => v >= p).get
      math.floor(v / mag).toInt
    }.map { case (d, xs) => d -> xs.length.toLong }
    val rows = DataQuality.benfordAudit(t).collect()
    assert(rows.map(r => r.getAs[Int]("digit") -> r.getAs[Long]("n_obs")).toMap
      == expected)
    val pctSum = rows.map(_.getAs[Double]("pct_obs")).sum
    assert(math.abs(pctSum - 1.0) < 1e-9)
    for (r <- rows) assert(r.getAs[Double]("chi_cell") >= 0)
    // uniform-ish synthetic values should NOT follow Benford — the audit
    // must actually flag its own fixture (digit-1 share far from 0.301
    // or a visibly elevated chi cell somewhere)
    assert(rows.map(_.getAs[Double]("chi_cell")).max > 1.0,
      "audit failed to flag a synthetic uniform value distribution")
  }

  test("q207: class replica parity and monotone risk in k") {
    val t = sf("sf0.01")
    val qi = t.events.select(col("event_type"), dayofmonth(col("ts")).as("d"),
        floor(col("value") / 100.0).cast("long").as("b"))
      .collect().map(r => (r.getAs[String]("event_type"), r.getAs[Int]("d"),
        if (r.isNullAt(2)) null else r.getAs[Long]("b")))
    val classes = qi.groupBy(identity).map(_._2.length.toLong).toSeq
    val rows = DataQuality.kAnonymity(t).collect().sortBy(_.getAs[Int]("k"))
    for (r <- rows) {
      val k = r.getAs[Int]("k")
      assert(r.getAs[Long]("n_classes_total") == classes.length)
      assert(r.getAs[Long]("n_classes_violating") == classes.count(_ < k))
      assert(r.getAs[Long]("n_rows_violating") == classes.filter(_ < k).sum)
    }
    val viol = rows.map(_.getAs[Long]("n_rows_violating"))
    assert(viol.zip(viol.tail).forall { case (a, b) => a <= b },
      "risk must be monotone in k")
  }

  test("q208: weighted-quantile replica; lengths monotone in q; mass reaches target") {
    val t = sf("sf0.001")
    val docs = t.documents.select(col("source"), col("text")).collect()
      .map(r => (r.getAs[String]("source"),
        r.getAs[String]("text").trim.split("\\s+").length.toLong))
    val expected = docs.groupBy(_._1).flatMap { case (src, g) =>
      val lens = g.map(_._2).sorted
      val tot = lens.sum
      Seq(25, 50, 75, 90).map { q =>
        var cum = 0L
        val len = lens.find { l => cum += l; cum * 100 >= q.toLong * tot }.get
        (src, q, len)
      }
    }.toSet
    val rows = RobustStats.weightedLengthQuantiles(t).collect()
    val actual = rows.map(r => (r.getAs[String]("source"), r.getAs[Int]("q"),
      r.getAs[Long]("weighted_len"))).toSet
    assert(actual == expected)
    for ((_, g) <- rows.groupBy(_.getAs[String]("source"))) {
      val byQ = g.sortBy(_.getAs[Int]("q"))
      val lens = byQ.map(_.getAs[Long]("weighted_len"))
      assert(lens.zip(lens.tail).forall { case (a, b) => a <= b })
      for (r <- byQ)
        assert(r.getAs[Double]("cum_mass_at_len") >= r.getAs[Int]("q") / 100.0)
    }
  }
}
