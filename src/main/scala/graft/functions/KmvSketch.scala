package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** KMV (k-minimum-values) distinct-count sketch.
  *
  * Estimator: hash every value into [0, M); keep the k smallest DISTINCT
  * hashes; if fewer than k distinct hashes exist the count is exact,
  * otherwise estimate `(k-1) * M / h_(k)` where `h_(k)` is the k-th
  * smallest (Bar-Yossef et al. 2002; the classic bottom-k sketch).
  *
  * Why KMV next to Spark's HLL (`approx_count_distinct`):
  *  - **engine-portable**: with the portable hash below, any SQL engine
  *    reproduces the estimate bit-for-bit (`list_sort(list(DISTINCT h))[k]`
  *    in DuckDB) — HLL sketches are implementation-defined;
  *  - **mergeable**: union of two sketches = merge the sorted arrays, keep
  *    k smallest — so partial aggregation / AQE re-partitioning work and
  *    the result is layout-independent, the same guarantee ExactAgg gives
  *    exact aggregates;
  *  - bounded state: k longs per group (k=256 → 2 KiB), shuffle carries
  *    sketches, not values.
  *
  * Relative error ~ 1/sqrt(k): k=256 → ~6%.
  */
object KmvSketch {

  val M = 2147483647L // 2^31 - 1

  /** Portable 31-bit hash of a non-negative integer key: two multiplicative
    * rounds mod M (Knuth 2654435761, then 2246822519). All intermediates
    * stay below 2^63 so overflow-checking engines (DuckDB) evaluate it
    * exactly: `(x mod M) * 2654435761 < 2^62.3`. */
  def hash31(c: Column): Column =
    pmod(pmod(pmod(c.cast("long"), lit(M)) * lit(2654435761L), lit(M)) *
      lit(2246822519L) + lit(1L), lit(M))

  /** The DuckDB mirror of [[hash31]]. */
  def hash31Sql(x: String): String =
    s"(((($x) % $M) * 2654435761 % $M) * 2246822519 + 1) % $M"

  /** The DuckDB mirror of the estimator over a value expression, for use in
    * a GROUP BY: exact below k distinct hashes, else (k-1)*M / h_(k). */
  def estimateSql(hashExpr: String, k: Int): String = {
    val num = (k - 1).toDouble * M // exact below 2^53
    s"""(CASE WHEN len(list_distinct(list($hashExpr))) < $k
       |      THEN CAST(len(list_distinct(list($hashExpr))) AS DOUBLE)
       |      ELSE $num / list_sort(list(DISTINCT $hashExpr))[$k] END)""".stripMargin
  }

  /** Typed Aggregator: buffer = sorted distinct array of the k smallest
    * hashes. reduce is O(log k) search + O(k) insert on new minima only;
    * merge is a linear sorted-merge. Deterministic for any input order. */
  private class KmvAgg(k: Int) extends Aggregator[Long, Array[Long], Double] {
    override def zero: Array[Long] = Array.emptyLongArray

    override def reduce(buf: Array[Long], h: Long): Array[Long] = {
      val pos = java.util.Arrays.binarySearch(buf, h)
      if (pos >= 0) buf // already present
      else {
        val ins = -pos - 1
        if (buf.length < k) {
          val out = new Array[Long](buf.length + 1)
          System.arraycopy(buf, 0, out, 0, ins)
          out(ins) = h
          System.arraycopy(buf, ins, out, ins + 1, buf.length - ins)
          out
        } else if (ins < k) { // h < current max: insert, drop largest
          val out = new Array[Long](k)
          System.arraycopy(buf, 0, out, 0, ins)
          out(ins) = h
          System.arraycopy(buf, ins, out, ins + 1, k - ins - 1)
          out
        } else buf
      }
    }

    override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
      val out = new Array[Long](math.min(k, a.length + b.length))
      var i = 0; var j = 0; var o = 0
      while (o < out.length && (i < a.length || j < b.length)) {
        val takeA = j >= b.length || (i < a.length && a(i) <= b(j))
        val v = if (takeA) a(i) else b(j)
        if (takeA) i += 1 else j += 1
        if (o == 0 || out(o - 1) != v) { out(o) = v; o += 1 } // cross-array dedupe
      }
      if (o == out.length) out else java.util.Arrays.copyOf(out, o)
    }

    override def finish(buf: Array[Long]): Double =
      if (buf.length < k) buf.length.toDouble
      else ((k - 1).toDouble * M) / buf(k - 1)

    override def bufferEncoder: Encoder[Array[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
    override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
  }

  /** KMV distinct-estimate aggregate column over a pre-hashed long column
    * (apply [[hash31]] first). */
  def kmvDistinct(hashed: Column, k: Int = 256): Column =
    udaf(new KmvAgg(k), Encoders.scalaLong).apply(hashed)
}
