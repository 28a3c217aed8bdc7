package graft

import graft.ext.TextAnalysis
import graft.operators.{DataQuality, RobustStats}
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

/** Contracts for the q209-q211 wave: Poisson bootstrap, distinctive terms,
  * corpus checksum. */
class BootstrapKeynessSpec extends SparkSpec {

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

  test("q209: replica parity — Poisson draws, weighted means, replica spread sane") {
    val t = sf("sf0.01")
    val cuts = Seq(0.36787944117144233, 0.7357588823428847, 0.9196986029286058,
      0.9810118431238462, 0.9963401531726563, 0.9994058151824183,
      0.9999167588507119).map(p => (p * graft.functions.KmvSketch.M).toLong)
    val perUser = t.events.filter(col("value").isNotNull)
      .select(col("user_id"), col("value")).collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Double]("value")))
      .groupBy(_._1).map { case (u, g) => u -> dsumReplica(g.toSeq.map(_._2)) }
    val expected = (0 until 32).map { b =>
      val ws = perUser.toSeq.map { case (u, y) =>
        val h = splitHashLong(u * 32 + b)
        val w = cuts.indexWhere(h < _) match { case -1 => cuts.length; case k => k }
        (w.toLong, y)
      }
      val sw = ws.map(_._1).sum
      (b, sw, bits(dsumReplica(ws.toSeq.map { case (w, y) => w * y }) / sw.toDouble))
    }.toSet
    val actual = RobustStats.poissonBootstrap(t).collect()
      .map(r => (r.getAs[Int]("b"), r.getAs[Long]("n_eff"),
        bits(r.getAs[Double]("mean_b")))).toSet
    assert(actual == expected)
    // Poisson(1) replica sizes concentrate around the user count
    val n = perUser.size.toDouble
    val effs = actual.toSeq.map(_._2.toDouble)
    assert(effs.forall(e => math.abs(e - n) < 5 * math.sqrt(n)),
      s"replica sizes ${effs.min}..${effs.max} far from n=$n")
  }

  test("q210: replica parity for the keyness ranking") {
    val t = sf("sf0.001")
    val toks = t.documents.select(col("source"), col("text")).collect()
      .flatMap(r => r.getAs[String]("text").trim.toLowerCase.split("\\s+")
        .map(r.getAs[String]("source") -> _))
    val bySrc = toks.groupBy(identity).map { case ((s, tk), g) => (s, tk, g.length.toLong) }
    val tokTotal = bySrc.groupBy(_._2).map { case (tk, g) => tk -> g.map(_._3).sum }
    val srcTotal = bySrc.groupBy(_._1).map { case (s, g) => s -> g.map(_._3).sum }
    val nAll = srcTotal.values.sum
    val expected = bySrc.filter(_._3 >= 5).map { case (s, tk, a) =>
      val b = tokTotal(tk) - a
      val nSrc = srcTotal(s); val nRest = nAll - nSrc
      val or = ((a.toDouble + 0.5) * ((nRest - b).toDouble + 0.5)) /
        ((b.toDouble + 0.5) * ((nSrc - a).toDouble + 0.5))
      (s, tk, or)
    }.groupBy(_._1).flatMap { case (s, g) =>
      g.toSeq.sortBy { case (_, tk, or) => (-or, tk) }.take(10).zipWithIndex
        .map { case ((_, tk, or), i) => (s, i + 1, tk, bits(or)) }
    }.toSet
    val actual = TextAnalysis.distinctiveTerms(t).collect()
      .map(r => (r.getAs[String]("source"), r.getAs[Int]("rank"),
        r.getAs[String]("token"), bits(r.getAs[Double]("odds_ratio")))).toSet
    assert(actual == expected)
  }

  test("q211: replica parity; checksum is layout-independent and content-sensitive") {
    val t = sf("sf0.001")
    val rows = t.documents.select(col("doc_id"), col("source"), col("lang"),
        col("n_chars"), col("text")).collect()
    val expected = rows.groupBy(_.getAs[String]("source")).map { case (s, g) =>
      val hs = g.map { r =>
        val canon = s"${r.getAs[Long]("doc_id")}|${r.getAs[String]("source")}|" +
          s"${r.getAs[String]("lang")}|${r.getAs[Long]("n_chars")}|${r.getAs[String]("text")}"
        graft.functions.PortableHash.hash62(UTF8String.fromString(canon))
      }
      (s, g.length.toLong, hs.map(_ >>> 31).sum, hs.map(_ & 2147483647L).sum)
    }.toSet
    val actual = DataQuality.corpusChecksum(t).collect()
      .map(r => (r.getAs[String]("source"), r.getAs[Long]("n_rows"),
        r.getAs[Long]("checksum_hi"), r.getAs[Long]("checksum_lo"))).toSet
    assert(actual == expected)
    // layout independence: the same content shuffled into a different
    // partitioning must produce the identical checksum (the audit's whole
    // contract — sums commute)
    graft.functions.PortableHash.registerHash62(spark)
    val canon = concat_ws("|", col("doc_id"), col("source"), col("lang"),
      col("n_chars"), col("text"))
    val again = t.documents.repartition(7, col("lang"))
      .select(col("source"),
        graft.functions.PortableHash.hash62Col(canon).as("h"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_rows"),
        sum(shiftrightunsigned(col("h"), 31)).as("checksum_hi"),
        sum(col("h").bitwiseAND(lit(2147483647L))).as("checksum_lo"))
      .collect()
      .map(r => (r.getAs[String]("source"), r.getAs[Long]("n_rows"),
        r.getAs[Long]("checksum_hi"), r.getAs[Long]("checksum_lo"))).toSet
    assert(again == actual)
  }
}
