package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types._

/** Native Catalyst expression for cosine similarity over embedding columns.
  *
  * The composable form — `aggregate(zip_with(a, b, *), 0d, +)` — walks the
  * arrays three times through higher-order-function lambdas with per-element
  * closure invocation; this expression fuses dot product and both norms
  * into ONE codegen'd loop over the underlying ArrayData (no boxing, no
  * intermediate arrays). Same left-to-right fold order as the HOF form, so
  * results are bit-identical and oracle comparisons are unaffected.
  *
  * Accepts float or double array elements; floats are widened per element
  * exactly like `transform(a, x -> cast(x as double))`.
  */
case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression {

  // ExpectsInputTypes' AbstractDataType/TypeCollection are private[sql];
  // declare the contract via checkInputDataTypes instead.
  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(dt: DataType) = dt match {
      case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
      case _                                                  => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"cosine_similarity expects array<float|double> inputs, got " +
        s"${left.dataType.catalogString} and ${right.dataType.catalogString}")
  }

  override def dataType: DataType = DoubleType

  private def elemType(e: Expression): DataType =
    e.dataType.asInstanceOf[ArrayType].elementType

  /** Mismatched lengths or null elements yield NULL — matching the
    * composable `aggregate(zip_with(...))` form, where zip_with null-pads
    * the shorter array and the null poisons the fold. */
  override def nullSafeEval(a: Any, b: Any): Any = {
    val (xs, ys) = (a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
    val n = xs.numElements()
    if (ys.numElements() != n) return null
    val (lf, rf) = (elemType(left) == FloatType, elemType(right) == FloatType)
    var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
    while (i < n) {
      if (xs.isNullAt(i) || ys.isNullAt(i)) return null
      val x = if (lf) xs.getFloat(i).toDouble else xs.getDouble(i)
      val y = if (rf) ys.getFloat(i).toDouble else ys.getDouble(i)
      dot += x * y; na += x * x; nb += y * y; i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val x = ctx.freshName("x")
      val y = ctx.freshName("y")
      val getA =
        if (elemType(left) == FloatType) s"(double) $a.getFloat($i)" else s"$a.getDouble($i)"
      val getB =
        if (elemType(right) == FloatType) s"(double) $b.getFloat($i)" else s"$b.getDouble($i)"
      s"""
         |final int $n = $a.numElements();
         |if ($b.numElements() != $n) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $dot = 0.0; double $na = 0.0; double $nb = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    final double $x = $getA;
         |    final double $y = $getB;
         |    $dot += $x * $y; $na += $x * $x; $nb += $y * $y;
         |  }
         |  if (!${ev.isNull}) {
         |    ${ev.value} = $dot / (java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb));
         |  }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** Native integer dot product Σ a(i)·b(i) over two long-array columns —
  * one codegen'd loop, replacing the interpreted
  * `aggregate(zip_with(a, b, *), 0L, +)` HOF chain in the quantized-ANN
  * kernels. Integer adds are exact and order-free, so results are
  * bit-identical to the composable form. NULL on length mismatch or null
  * element (zip_with's null-pad poisons the HOF fold the same way). */
case class LongDot(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"dot_long expects array<bigint> inputs, got ${l.catalogString} and ${r.catalogString}")
    }

  override def dataType: DataType = LongType

  override def nullSafeEval(a: Any, b: Any): Any = {
    val (xs, ys) = (a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
    val n = xs.numElements()
    if (ys.numElements() != n) return null
    var acc = 0L; var i = 0
    while (i < n) {
      if (xs.isNullAt(i) || ys.isNullAt(i)) return null
      acc += xs.getLong(i) * ys.getLong(i); i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i"); val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      s"""
         |final int $n = $a.numElements();
         |if ($b.numElements() != $n) {
         |  ${ev.isNull} = true;
         |} else {
         |  long $acc = 0L;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    $acc += $a.getLong($i) * $b.getLong($i);
         |  }
         |  if (!${ev.isNull}) { ${ev.value} = $acc; }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** Native squared Euclidean distance Σ (a(i)−b(i))² over two long-array
  * columns — the [[LongDot]] treatment of the PQ/k-means/k-center
  * assignment kernel (`aggregate(zip_with(a, b, (x,y) => (x-y)*(x-y)),
  * 0L, +)`). Exact integer arithmetic, bit-identical, NULL contract as
  * [[LongDot]]. */
case class LongSqDist(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"sqdist_long expects array<bigint> inputs, got ${l.catalogString} and ${r.catalogString}")
    }

  override def dataType: DataType = LongType

  override def nullSafeEval(a: Any, b: Any): Any = {
    val (xs, ys) = (a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
    val n = xs.numElements()
    if (ys.numElements() != n) return null
    var acc = 0L; var i = 0
    while (i < n) {
      if (xs.isNullAt(i) || ys.isNullAt(i)) return null
      val d = xs.getLong(i) - ys.getLong(i)
      acc += d * d; i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i"); val n = ctx.freshName("n")
      val acc = ctx.freshName("acc"); val d = ctx.freshName("d")
      s"""
         |final int $n = $a.numElements();
         |if ($b.numElements() != $n) {
         |  ${ev.isNull} = true;
         |} else {
         |  long $acc = 0L;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    final long $d = $a.getLong($i) - $b.getLong($i);
         |    $acc += $d * $d;
         |  }
         |  if (!${ev.isNull}) { ${ev.value} = $acc; }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** Registration + Column-API access for the vector expressions. */
object VectorExpressions {

  private val fnName = "graft_cosine_similarity"
  private val dotLongName = "graft_dot_long"
  private val sqDistLongName = "graft_sqdist_long"

  /** Idempotently register the expressions in the session's function
    * registry (temp functions — session-scoped, like the reference's
    * engine-internal functions). */
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      fnName,
      exprs => CosineSimilarity(exprs(0), exprs(1)),
      "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      dotLongName,
      exprs => LongDot(exprs(0), exprs(1)),
      "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      sqDistLongName,
      exprs => LongSqDist(exprs(0), exprs(1)),
      "scala_udf")
  }

  /** Cosine similarity column over two float/double array columns. The
    * session must have called [[register]] (Tables does). */
  def cosineSim(a: Column, b: Column): Column = call_function(fnName, a, b)

  /** Integer dot product over two long-array columns ([[LongDot]]). */
  def dotLong(a: Column, b: Column): Column = call_function(dotLongName, a, b)

  /** Integer squared Euclidean distance over two long-array columns
    * ([[LongSqDist]]). */
  def sqDistLong(a: Column, b: Column): Column = call_function(sqDistLongName, a, b)

  /** Marker so callers can assert registration happened. */
  def isRegistered(spark: org.apache.spark.sql.SparkSession): Boolean =
    spark.sessionState.functionRegistry
      .functionExists(org.apache.spark.sql.catalyst.FunctionIdentifier(fnName))
}
