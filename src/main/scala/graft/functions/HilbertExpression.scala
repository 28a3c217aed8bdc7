package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types._

/** Hilbert-curve index for multi-dimensional data layout — the
  * better-locality alternative to the Z-order (Morton) curve of
  * [[ZOrder]]: consecutive Hilbert cells are always Manhattan-adjacent
  * (the Morton curve takes long diagonal jumps at quadrant boundaries),
  * so per-file min/max ranges after range-partitioning on the index are
  * tighter on average — the curve Delta Lake moved to for `OPTIMIZE`
  * clustering ("liquid clustering") after shipping Z-order.
  *
  * The classic xy→d conversion is an inherently ITERATIVE 16-round
  * rotate/reflect loop (one round per bit level), which as nested Column
  * `when` trees would double in size every round (the rotation references
  * both previous coordinates). So the kernel is a native Catalyst
  * expression with a codegen'd loop — the same pattern as
  * [[CosineSimilarity]] — and the DuckDB oracle replays it as a 16-stage
  * CTE chain (one SELECT per round, see [[HilbertCurve.roundSql]]), which
  * is arithmetic-identical.
  *
  * Inputs are masked to their low 16 bits like [[ZOrder]] — callers scale
  * dimensions onto [0, 65536) first ([[ZOrder.scaleTo16]]).
  */
case class HilbertIndex(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == LongType && right.dataType == LongType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"hilbert_index expects (bigint, bigint), got " +
        s"${left.dataType.catalogString} and ${right.dataType.catalogString}")

  override def dataType: DataType = LongType

  override def nullSafeEval(a: Any, b: Any): Any =
    HilbertCurve.xy2d(a.asInstanceOf[Long], b.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val x = ctx.freshName("x")
      val y = ctx.freshName("y")
      val d = ctx.freshName("d")
      val s = ctx.freshName("s")
      val rx = ctx.freshName("rx")
      val ry = ctx.freshName("ry")
      val t = ctx.freshName("t")
      s"""
         |long $x = $a & 0xFFFFL;
         |long $y = $b & 0xFFFFL;
         |long $d = 0L;
         |for (long $s = 32768L; $s > 0L; $s >>= 1) {
         |  final long $rx = (($x & $s) > 0L) ? 1L : 0L;
         |  final long $ry = (($y & $s) > 0L) ? 1L : 0L;
         |  $d += $s * $s * ((3L * $rx) ^ $ry);
         |  if ($ry == 0L) {
         |    if ($rx == 1L) { $x = 65535L - $x; $y = 65535L - $y; }
         |    final long $t = $x; $x = $y; $y = $t;
         |  }
         |}
         |${ev.value} = $d;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** Registration + Column access + the single-node reference + the DuckDB
  * round mirror for [[HilbertIndex]]. */
object HilbertCurve {

  /** Grid size: 16 bits per dimension. */
  val N = 65536L

  /** The single-node reference implementation (also the interpreted eval
    * path) — the classic per-bit rotate/reflect conversion. */
  def xy2d(x0: Long, y0: Long): Long = {
    var x = x0 & 0xFFFFL
    var y = y0 & 0xFFFFL
    var d = 0L
    var s = N / 2
    while (s > 0) {
      val rx = if ((x & s) > 0) 1L else 0L
      val ry = if ((y & s) > 0) 1L else 0L
      d += s * s * ((3 * rx) ^ ry)
      if (ry == 0) {
        if (rx == 1) { x = N - 1 - x; y = N - 1 - y }
        val t = x; x = y; y = t
      }
      s >>= 1
    }
    d
  }

  private val fnName = "graft_hilbert_index"

  /** Idempotently register the expression (session-scoped temp function,
    * like [[VectorExpressions.register]]). */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      fnName,
      exprs => HilbertIndex(exprs(0), exprs(1)),
      "scala_udf")

  /** Hilbert index column over two bigint dimension columns already
    * scaled to [0, 65536). The session must have called [[register]]. */
  def hilbertIndex(x: Column, y: Column): Column = call_function(fnName, x, y)

  /** One round of the xy→d loop as a DuckDB SELECT stage: given columns
    * (x, y, d) from the previous stage, emit the next (x, y, d). Chain 16
    * of these (s = 32768 … 1) to replay the codegen'd loop exactly.
    * `keys` = pass-through columns. */
  def roundSql(s: Long, keys: String): String = {
    val rx = s"(CASE WHEN (x & $s) > 0 THEN 1 ELSE 0 END)"
    val ry = s"(CASE WHEN (y & $s) > 0 THEN 1 ELSE 0 END)"
    s"""SELECT $keys,
       |  d + CAST(${s * s} AS BIGINT) * xor(3 * $rx, $ry) AS d,
       |  CASE WHEN (y & $s) = 0
       |       THEN CASE WHEN (x & $s) > 0 THEN 65535 - y ELSE y END
       |       ELSE x END AS x,
       |  CASE WHEN (y & $s) = 0
       |       THEN CASE WHEN (x & $s) > 0 THEN 65535 - x ELSE x END
       |       ELSE y END AS y""".stripMargin
  }

  /** The full 16-stage CTE chain: input CTE must expose (keys, x, y) —
    * emits CTEs h0..h16 where h16 holds the final (keys, d, x, y). */
  def chainSql(inputCte: String, keys: String): String = {
    val stages = Iterator.iterate(32768L)(_ >> 1).takeWhile(_ > 0).toSeq
    val ctes = stages.zipWithIndex.map { case (s, i) =>
      val prev = if (i == 0) "h0" else s"h$i"
      s"h${i + 1} AS (\n${roundSql(s, keys)}\n  FROM $prev)"
    }
    s"h0 AS (SELECT $keys, 0 AS d, x, y FROM $inputCte),\n${ctes.mkString(",\n")}"
  }
}
