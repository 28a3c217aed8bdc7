package graft

import graft.functions.ExactAgg
import org.apache.spark.sql.functions._

/** Properties of the order-independent aggregate kernels: results match a
  * BigDecimal reference and are invariant under repartitioning (the whole
  * point — plain double sums are neither). Seeded random cents data stands
  * in for property generators (the scalatest/scalacheck bridge is not in
  * the offline cache). */
class ExactAggSpec extends SparkSpec {

  private val rnd = new scala.util.Random(7)
  private def centsData(n: Int): List[Double] =
    List.fill(n)((rnd.nextLong() % 10000000L) / 100.0)

  test("dsum equals BigDecimal reference and is partition-invariant (bitwise)") {
    import spark.implicits._
    for (n <- Seq(1, 17, 1000)) {
      val xs = centsData(n)
      val expected = xs.map(BigDecimal(_).setScale(6, BigDecimal.RoundingMode.HALF_UP)).sum.toDouble
      val df = xs.toDF("x")
      val r1 = df.repartition(1).agg(ExactAgg.dsum(col("x"))).head.getDouble(0)
      val r7 = df.repartition(7).agg(ExactAgg.dsum(col("x"))).head.getDouble(0)
      assert(r1 == expected && r7 == expected, s"n=$n")
    }
  }

  test("davg equals exact-sum/n") {
    import spark.implicits._
    for (n <- Seq(2, 8, 333)) { // 8: the midpoint-quotient shape that broke plain avg
      val xs = centsData(n)
      val expected = xs.map(BigDecimal(_).setScale(6, BigDecimal.RoundingMode.HALF_UP)).sum.toDouble / n
      val got = xs.toDF("x").repartition(3).agg(ExactAgg.davg(col("x"))).head.getDouble(0)
      assert(got == expected, s"n=$n")
    }
  }

  test("dstd matches two-pass reference and is partition-invariant (bitwise)") {
    import spark.implicits._
    for (n <- Seq(2, 100)) {
      val xs = centsData(n)
      val mean = xs.sum / n
      val ref = math.sqrt(xs.map(x => (x - mean) * (x - mean)).sum / (n - 1))
      val r1 = xs.toDF("x").repartition(1).agg(ExactAgg.dstd(col("x"))).head.getDouble(0)
      val r5 = xs.toDF("x").repartition(5).agg(ExactAgg.dstd(col("x"))).head.getDouble(0)
      assert(r1 == r5, s"n=$n not partition-invariant")
      assert(math.abs(r1 - ref) <= 1e-6 * (1 + ref.abs), s"n=$n vs reference")
    }
  }

  test("dstd of a single row is null (stddev_samp semantics)") {
    import spark.implicits._
    val r = Seq(1.23).toDF("x").agg(ExactAgg.dstd(col("x"))).head
    assert(r.isNullAt(0))
  }

  test("dcorr matches Spark corr within 1e-9 on well-conditioned data") {
    import spark.implicits._
    val xs = (1 to 500).map(i => (i / 100.0, (i * 3 % 97) / 10.0))
    val df = xs.toDF("x", "y")
    val exact = df.agg(ExactAgg.dcorr(col("x"), col("y"))).head.getDouble(0)
    val builtin = df.agg(corr(col("x"), col("y"))).head.getDouble(0)
    assert(math.abs(exact - builtin) < 1e-9)
  }

  test("dsumRevenue matches BigDecimal reference") {
    import spark.implicits._
    val rows = List.fill(200)(((rnd.nextInt(1000000)) / 100.0, rnd.nextInt(10) / 100.0))
    val expected = rows
      .map { case (p, d) =>
        val p2 = BigDecimal(p).setScale(2, BigDecimal.RoundingMode.HALF_UP)
        val d2 = BigDecimal(d).setScale(2, BigDecimal.RoundingMode.HALF_UP)
        p2 * (BigDecimal(1) - d2)
      }
      .sum.toDouble
    val got = rows.toDF("p", "d").repartition(4)
      .agg(ExactAgg.dsumRevenue(col("p"), col("d"))).head.getDouble(0)
    assert(got == expected)
  }
}
