package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Order-independent aggregate kernels for oracle-stable results.
  *
  * Plain `sum`/`avg`/`stddev`/`corr` over doubles are summation-order
  * dependent: Spark and an oracle engine partition the data differently, so
  * results differ in the last ulps, and with cents-valued money data the
  * true quotients frequently sit exactly on decimal rounding midpoints —
  * `round(x, n)` then flips either way and golden comparisons fail.
  *
  * Fix: accumulate in DECIMAL (exact, associative — order-independent),
  * cast the exact sum to double, and derive avg/stddev/corr from the exact
  * moments with a fixed scalar formula. Any engine that mirrors the same
  * formula over the same exact sums reproduces our doubles bit-for-bit.
  *
  * At 100 TB this also removes a correctness footgun: partial aggregation
  * and AQE re-partitioning reorder summation freely; decimal accumulation
  * makes results stable across retries, speculative tasks, and cluster
  * layout changes.
  */
object ExactAgg {

  private val D6 = "decimal(18,6)"

  /** Exact decimal sum (kept as decimal — for window-frame reuse). */
  def dsumDec(c: Column): Column = sum(c.cast(D6))

  /** Exact sum of a double column, returned as double.
    *
    * Fast path: micro-units (1e-6) as primitive longs, hi/lo split-summed
    * (see [[splitProdSum]]; `>>` is arithmetic and `&` two's-complement in
    * both Spark and DuckDB, so the split identity holds for negatives too
    * — verified empirically). Rounds each value at 6 dp exactly like the
    * decimal(18,6) cast it replaces; |values| must stay below ~9e12. */
  def dsum(c: Column): Column = {
    val p = round(c * lit(1000000), 0).cast("long")
    (sum(shiftright(p, 26)).cast("double") * lit(67108864.0) +
      sum(p.bitwiseAND(lit(67108863L))).cast("double")) / lit(1000000.0)
  }

  /** Integer cents as a primitive long: round-half-up then truncating cast
    * (a bare double→long cast truncates toward zero, which would knock
    * cents values sitting just below the integer down by one). The per-row
    * product then runs as a codegen'd long multiply — ~6× faster than
    * decimal×decimal — and only the SUM pays the decimal cost (long
    * products up to ~1e14 would overflow a long sum past ~90k rows). */
  private def centsLong(c: Column): Column = round(c * lit(100), 0).cast("long")

  /** Public form of [[centsLong]] — for callers that pre-materialize cents
    * vectors and run the hi/lo split-product kernel through a native
    * expression (q138's pair dot): the cents MUST come from this exact
    * expression so the quantization is bit-identical to [[dsumProd]]. */
  def cents(c: Column): Column = centsLong(c)

  /** Order-independent sum of NON-NEGATIVE long products without decimal
    * per-row cost: split each product p into hi = p >> 26 and lo = p & (2^26
    * - 1) and sum both as plain longs (fully codegen'd; overflow-safe to
    * ~500M rows/group at our magnitudes), then recombine per GROUP as a
    * fixed double expression. The recombine rounds (≥2^53), but from exact
    * long inputs with identical operations — so it is deterministic and
    * engine-portable, which is the guarantee that matters (see class doc).
    * Caller contract: products must be >= 0 (shift/mask split breaks on
    * negatives) — true for all kernels below (prices, quantities,
    * squares). */
  private def splitProdSum(p: Column): Column =
    sum(shiftrightunsigned(p, 26)).cast("double") * lit(67108864.0) +
      sum(p.bitwiseAND(lit(67108863L))).cast("double")

  /** Exact sum of a product of two double columns, via integer-cents
    * accumulation; result in original units. */
  def dsumProd(x: Column, y: Column): Column =
    splitProdSum(centsLong(x) * centsLong(y)) / lit(10000.0)

  /** sum(x * (1 - y)) — the revenue kernel, cents-exact. */
  def dsumRevenue(price: Column, discount: Column): Column =
    splitProdSum(centsLong(price) * centsLong(lit(1) - discount)) / lit(10000.0)

  /** Exact average: exact sum / row count (single double division). */
  def davg(c: Column): Column = dsum(c) / count(lit(1))

  /** Sample stddev from exact moments: sqrt((Q - S*S/n) / (n - 1)),
    * NULL for n <= 1 (matches stddev_samp semantics). */
  def dstd(c: Column): Column = {
    val n = count(lit(1)).cast("double")
    val s = dsum(c)
    val q = dsumProd(c, c)
    when(count(lit(1)) > 1, sqrt((q - s * s / n) / (n - lit(1.0))))
  }

  /** Pearson correlation from exact moments:
    * (n*Sxy - Sx*Sy) / sqrt((n*Sxx - Sx*Sx) * (n*Syy - Sy*Sy)). */
  def dcorr(x: Column, y: Column): Column = {
    val n   = count(lit(1)).cast("double")
    val sx  = dsum(x)
    val sy  = dsum(y)
    val sxy = dsumProd(x, y)
    val sxx = dsumProd(x, x)
    val syy = dsumProd(y, y)
    (n * sxy - sx * sy) / sqrt((n * sxx - sx * sx) * (n * syy - sy * sy))
  }

  /** The DuckDB-SQL mirrors of the kernels above (string builders used by
    * SparkEntry.oracleSql — keeping both sides adjacent in code). */
  object Sql {
    def dsum(x: String): String =
      s"((CAST(sum(CAST(round(($x) * 1000000, 0) AS BIGINT) >> 26) AS DOUBLE) * 67108864.0" +
        s" + CAST(sum(CAST(round(($x) * 1000000, 0) AS BIGINT) & 67108863) AS DOUBLE)) / 1000000.0)"
    // Mirrors the hi/lo split-sum kernel (see splitProdSum above): the
    // cents product as BIGINT, shifted/masked, both parts long-summed and
    // recombined in double. CAST(round(v*100, 0) AS BIGINT) matches Spark's
    // round-then-truncate cents conversion.
    private def prod(x: String, y: String): String =
      s"(CAST(round(($x) * 100, 0) AS BIGINT) * CAST(round(($y) * 100, 0) AS BIGINT))"
    private def splitProdSum(p: String): String =
      s"(CAST(sum($p >> 26) AS DOUBLE) * 67108864.0 + CAST(sum($p & 67108863) AS DOUBLE))"
    def dsumProd(x: String, y: String): String =
      s"(${splitProdSum(prod(x, y))} / 10000.0)"
    def dsumRevenue(p: String, d: String): String =
      s"(${splitProdSum(prod(p, s"1 - ($d)"))} / 10000.0)"
    def davg(x: String): String = s"(${dsum(x)} / count(*))"
    def dstd(x: String): String =
      s"(CASE WHEN count(*) > 1 THEN sqrt((${dsumProd(x, x)} - ${dsum(x)} * ${dsum(x)} / CAST(count(*) AS DOUBLE)) / (CAST(count(*) AS DOUBLE) - 1.0)) END)"
    def dcorr(x: String, y: String): String =
      s"((CAST(count(*) AS DOUBLE) * ${dsumProd(x, y)} - ${dsum(x)} * ${dsum(y)}) / sqrt((CAST(count(*) AS DOUBLE) * ${dsumProd(x, x)} - ${dsum(x)} * ${dsum(x)}) * (CAST(count(*) AS DOUBLE) * ${dsumProd(y, y)} - ${dsum(y)} * ${dsum(y)})))"
  }
}
