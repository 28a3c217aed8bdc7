package graft

import graft.operators.Analytics
import org.apache.spark.sql.functions._

/** The bounded-memory disc-quantile selection (q253/q255 boundary
  * machinery): [[Analytics.gridQuantileDiscs]] must return EXACTLY the
  * value `percentile_disc` returns — the ceil(q·n)-th order statistic, an
  * actual data value — for any data shape, because the DuckDB oracles of
  * its consumers replay the boundary as `quantile_disc`. Property-checked
  * against Spark's own `percentile_disc` over randomized frames (varied
  * n, duplicates, negative values, constant columns) and against a plain
  * Scala sort at every tercile, plus the descent paths (cap smaller than
  * n forces histogram levels; duplicate-heavy data forces the
  * min==max-cell early exit). */
class GridQuantileDiscSpec extends SparkSpec {

  private val terciles = Seq(0.3333333333333333, 0.6666666666666666)

  private def sparkDisc(values: Seq[Double], q: Double): Double = {
    import spark.implicits._
    values.toDF("v").agg(
      expr(s"percentile_disc($q) WITHIN GROUP (ORDER BY v)")).head().getDouble(0)
  }

  private def check(values: Seq[Double], qs: Seq[Double],
                    grid: Int = 16, cap: Int = 8): Unit = {
    import spark.implicits._
    val df = values.toDF("v")
    val got = Analytics.gridQuantileDiscs(df, "v", qs, grid, cap)
    qs.zip(got).foreach { case (q, g) =>
      val want = sparkDisc(values, q)
      assert(g == want,
        s"q=$q over n=${values.size}: got $g, percentile_disc says $want")
      // and percentile_disc semantics themselves: the ceil(q·n)-th order
      // statistic of the sorted multiset
      val rank = math.ceil(q * values.size.toDouble).toInt
      assert(g == values.sorted.apply(rank - 1),
        s"q=$q: $g is not the ceil(q*n)=$rank-th order statistic")
    }
  }

  test("matches percentile_disc on randomized frames (small cap forces descent)") {
    val rnd = new scala.util.Random(42)
    for (n <- Seq(1, 2, 3, 4, 5, 7, 20, 101, 300)) {
      val values = Seq.fill(n)(math.floor(rnd.nextDouble() * 1000) / 10 - 40)
      check(values, terciles)
    }
  }

  test("duplicate-heavy data: runs never split across cells") {
    val rnd = new scala.util.Random(7)
    // only 4 distinct values over 200 rows — the crossing cell is a
    // single-value run, exercising the min==max early exit
    val values = Seq.fill(200)(Seq(1.0, 2.0, 2.0, 5.0, 9.0)(rnd.nextInt(5)))
    check(values, terciles)
    check(values, Seq(0.1, 0.5, 0.9, 1.0))
  }

  test("constant column, single row, negative values, extreme fractions") {
    check(Seq.fill(50)(3.25), terciles)
    check(Seq(42.0), terciles ++ Seq(1.0))
    check(Seq(-5.0, -1.0, -9.5, 0.0, 2.5), Seq(0.2, 0.4, 0.6, 0.8, 1.0))
  }

  test("q = 1.0 returns the max; tiny grid still exact") {
    val values = (1 to 97).map(_.toDouble * 1.5)
    check(values, Seq(1.0), grid = 2, cap = 4)
    check(values, terciles, grid = 2, cap = 4)
  }

  test("large cap takes the direct TakeOrdered path") {
    val values = (1 to 60).map(i => (i % 13).toDouble)
    check(values, terciles, grid = 1024, cap = 1 << 16)
  }

  test("nulls are excluded from the population") {
    import spark.implicits._
    val df = Seq[Option[Double]](Some(1.0), None, Some(2.0), Some(3.0), None)
      .toDF("v")
    val got = Analytics.gridQuantileDiscs(df, "v", Seq(0.5), 16, 2)
    assert(got == Seq(2.0))
  }
}
