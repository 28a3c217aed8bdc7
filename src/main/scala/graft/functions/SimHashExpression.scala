package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XxHash64Function}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types._

/** Native SimHash over a token array: per token, each bit of
  * xxhash64(token) votes ±1; the sign of each bit-sum forms the 64-bit
  * fingerprint. One compiled eval loop — same reasoning as
  * [[MinHashSignature]] (the SQL higher-order-function form walks an
  * interpreted expression tree 64× per token). Values are bit-identical to
  * the HOF form (same xxhash64 seed 42), asserted in tests.
  */
case class SimHash(child: Expression) extends UnaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"simhash expects array<string>, got ${other.catalogString}")
  }

  override def dataType: DataType = LongType

  override def nullSafeEval(input: Any): Any = {
    val tokens = input.asInstanceOf[ArrayData]
    val n = tokens.numElements()
    val votes = new Array[Int](64)
    var i = 0
    while (i < n) {
      val h = XxHash64Function.hash(tokens.getUTF8String(i), StringType, 42L)
      var b = 0
      while (b < 64) {
        if (((h >> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
        b += 1
      }
      i += 1
    }
    var fp = 0L
    var b = 0
    while (b < 64) {
      if (votes(b) > 0) fp |= (1L << b)
      b += 1
    }
    java.lang.Long.valueOf(fp)
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

object SimHashExpression {
  private val fnName = "graft_simhash"

  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      fnName, exprs => SimHash(exprs.head), "scala_udf")

  def simhash(tokens: Column): Column = call_function(fnName, tokens)
}
