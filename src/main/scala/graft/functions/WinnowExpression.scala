package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types._

/** Native winnowing fingerprint selector (Schleimer et al. 2003) over a
  * token array: the portable q32 rolling hash of every word k-shingle,
  * then the minimum of each w-window of consecutive shingle hashes, then
  * first-occurrence dedup. Byte-identical to the composable
  * `transform(sequence) + aggregate(slice) + array_min(slice)` chain it
  * replaces (asserted in CorpusSignalsSpec's single-node replica parity)
  * and to the DuckDB mirror's list_transform/list_reduce/list_min chain.
  *
  * Why native: the composable form walks an interpreted Catalyst
  * expression tree PER SHINGLE TOKEN and PER WINDOW ELEMENT (HOFs are
  * CodegenFallback), which measured 359 s for 5,000 documents at sf0.1 —
  * DuckDB runs the identical logic in 0.4 s. This eval is two straight
  * loops over primitive longs: same semantics, linear cost, the
  * MinHashExpression/WordShingles doctrine for hot per-row kernels.
  *
  * Semantics pinned to the composable form:
  *  - shingle hash: fold over the k tokens of acc*131 + (ascii*31 + len)
  *    mod 1e9+7, acc starting at 0; `ascii` is Spark's (first BYTE as
  *    int, 0 for empty), `len` is the character count;
  *  - fewer than k tokens → empty selection (callers filter these);
  *  - fewer than w shingle hashes → ALL hashes selected (the window
  *    would cover the whole document);
  *  - result order: first occurrence, as array_distinct leaves it.
  */
case class WinnowedFingerprints(child: Expression, k: Int, w: Int)
    extends UnaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"winnow expects array<string>, got ${other.catalogString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  private val P = 1000000007L

  override def nullSafeEval(input: Any): Any = {
    val tokens = input.asInstanceOf[ArrayData]
    val n = tokens.numElements()
    if (n < k) return new GenericArrayData(Array.empty[Any])
    val m = n - k + 1
    val hs = new Array[Long](m)
    var i = 0
    while (i < m) {
      var acc = 0L
      var j = i
      while (j < i + k) {
        val tk = tokens.getUTF8String(j)
        val bytes = tk.getBytes
        val a = if (bytes.length > 0) bytes(0).toInt else 0
        acc = java.lang.Math.floorMod(
          acc * 131L + (a.toLong * 31L + tk.numChars().toLong), P)
        j += 1
      }
      hs(i) = acc
      i += 1
    }
    val selCount = if (m >= w) m - w + 1 else m
    val seen = new java.util.LinkedHashSet[java.lang.Long](selCount)
    if (m >= w) {
      var j = 0
      while (j <= m - w) {
        var mn = hs(j)
        var x = j + 1
        while (x < j + w) { if (hs(x) < mn) mn = hs(x); x += 1 }
        seen.add(mn)
        j += 1
      }
    } else {
      var j = 0
      while (j < m) { seen.add(hs(j)); j += 1 }
    }
    val out = new Array[Any](seen.size)
    val it = seen.iterator()
    var o = 0
    while (it.hasNext) { out(o) = it.next().longValue(); o += 1 }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

object WinnowExpression {

  private val fnName = "graft_winnow"

  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      fnName,
      exprs => WinnowedFingerprints(
        exprs.head,
        exprs.lift(1).map(_.eval().asInstanceOf[Number].intValue()).getOrElse(3),
        exprs.lift(2).map(_.eval().asInstanceOf[Number].intValue()).getOrElse(4)),
      "scala_udf")

  /** Winnowed fingerprint array (array<long>) of a token-array column.
    * Call [[register]] on the session first. */
  def winnow(tokens: Column, k: Int = 3, w: Int = 4): Column =
    call_function(fnName, tokens,
      org.apache.spark.sql.functions.lit(k),
      org.apache.spark.sql.functions.lit(w))
}
