package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Z-order (Morton) curve values for multi-dimensional data layout.
  *
  * A linear sort clusters one dimension perfectly and scatters every other
  * dimension across all files; interleaving the bits of two dimensions
  * makes file-level min/max ranges tight in BOTH — so a predicate on either
  * dimension prunes ~sqrt-of-files instead of none. This is the layout
  * trick behind Delta/Iceberg `OPTIMIZE ZORDER BY`, rebuilt here as plain
  * column arithmetic: 9 shift/mask ops per dimension, fully inside
  * whole-stage codegen, and bit-identical in any engine with `<<`/`&`/`|`
  * (the DuckDB oracle replays it).
  *
  * Inputs are masked to their low 16 bits, so callers bin real-valued or
  * wide dimensions into [0, 65536) first — binning is part of the layout
  * contract anyway (a z-curve over raw 64-bit values interleaves noise
  * bits).
  */
object ZOrder {

  /** Spreads the low 16 bits of `c` to the even bit positions of a 32-bit
    * value (classic parallel-prefix bit spread). */
  def spread16(c: Column): Column = {
    val x0 = c.cast("long").bitwiseAND(lit(0xFFFFL))
    val x1 = x0.bitwiseOR(shiftleft(x0, 8)).bitwiseAND(lit(0x00FF00FFL))
    val x2 = x1.bitwiseOR(shiftleft(x1, 4)).bitwiseAND(lit(0x0F0F0F0FL))
    val x3 = x2.bitwiseOR(shiftleft(x2, 2)).bitwiseAND(lit(0x33333333L))
    x3.bitwiseOR(shiftleft(x3, 1)).bitwiseAND(lit(0x55555555L))
  }

  /** 32-bit z-value interleaving the low 16 bits of two dimensions: bit i
    * of `x` lands at position 2i, bit i of `y` at 2i+1. */
  def zValue(x: Column, y: Column): Column =
    spread16(x).bitwiseOR(shiftleft(spread16(y), 1))

  /** The DuckDB mirror of [[spread16]]. */
  def spread16Sql(x: String): String = {
    val x0 = s"(($x) & 65535)"
    val x1 = s"(($x0 | ($x0 << 8)) & 16711935)"
    val x2 = s"(($x1 | ($x1 << 4)) & 252645135)"
    val x3 = s"(($x2 | ($x2 << 2)) & 858993459)"
    s"(($x3 | ($x3 << 1)) & 1431655765)"
  }

  /** The DuckDB mirror of [[zValue]]. */
  def zValueSql(x: String, y: String): String =
    s"(${spread16Sql(x)} | (${spread16Sql(y)} << 1))"

  /** Scales a dimension with domain [lo, hi) onto the full 16-bit range —
    * WITHOUT this, a narrow dimension occupies only the low bits of the
    * interleave and the curve splits the wide dimension 2^Δbits more
    * finely (a 10-bit×8-bit interleave clusters users 4× worse than
    * hours). Out-of-domain values clamp to BOTH boundary cells (a value
    * below `lo` must pin to the curve's start, not alias into the high
    * end through the sign bits). Floor-of-double division is exact while
    * `(hi - lo) * 65536` stays below 2^53 — any sane layout domain. */
  def scaleTo16(c: Column, lo: Column, hi: Column): Column =
    least(greatest(
      floor((c.cast("long") - lo) * lit(65536L) / (hi - lo)).cast("long"),
      lit(0L)), lit(65535L))

  /** [[scaleTo16]] for a domain known at plan time. */
  def scaleTo16(c: Column, lo: Long, hi: Long): Column =
    scaleTo16(c, lit(lo), lit(hi))

  /** The DuckDB mirror of [[scaleTo16]]; `lo`/`hi` are SQL expressions.
    * The input is cast to BIGINT like the Scala side — without it the
    * `(x - lo) * 65536` product runs in INT32 and overflows for any
    * dimension wider than 32768 units. */
  def scaleTo16Sql(x: String, lo: String, hi: String): String =
    s"least(greatest(CAST(floor((CAST(($x) AS BIGINT) - ($lo)) * 65536 / (($hi) - ($lo))) AS BIGINT), 0), 65535)"

  /** [[scaleTo16Sql]] for a literal domain. */
  def scaleTo16Sql(x: String, lo: Long, hi: Long): String =
    scaleTo16Sql(x, lo.toString, hi.toString)
}
