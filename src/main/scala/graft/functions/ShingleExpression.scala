package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native word-k-shingle builder over a token array: contiguous k-grams
  * joined by a single space; documents shorter than k tokens contribute
  * their whole token string as one shingle — byte-identical to the
  * composable form in `graft.ext.Dedup.shingles` (asserted in tests).
  *
  * The composable form routes through `transform(sequence(...), slice +
  * array_join)` — Catalyst HOFs are CodegenFallback and walk an expression
  * tree per produced shingle. This expression is also CodegenFallback but
  * its eval is one straight loop with a reused StringBuilder: on the LSH
  * verify path (shingle sets for every candidate document) that is the
  * difference between an interpreted per-element tree walk and a compiled
  * pass when candidates number in the millions at 100 TB.
  */
case class WordShingles(child: Expression, k: Int)
    extends UnaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"word_shingles expects array<string>, got ${other.catalogString}")
  }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def nullSafeEval(input: Any): Any = {
    val tokens = input.asInstanceOf[ArrayData]
    val n = tokens.numElements()
    val sb = new java.lang.StringBuilder(64)
    def joinRange(from: Int, until: Int): UTF8String = {
      sb.setLength(0)
      var j = from
      while (j < until) {
        if (j > from) sb.append(' ')
        sb.append(tokens.getUTF8String(j).toString)
        j += 1
      }
      UTF8String.fromString(sb.toString)
    }
    val out =
      if (n < k) Array[Any](joinRange(0, n))
      else Array.tabulate[Any](n - k + 1)(i => joinRange(i, i + k))
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

object ShingleExpression {

  private val fnName = "graft_word_shingles"

  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      fnName,
      exprs => WordShingles(
        exprs.head,
        exprs.lift(1).map(_.eval().asInstanceOf[Number].intValue()).getOrElse(3)),
      "scala_udf")

  /** Word k-shingles (array of strings) of a token-array column. Call
    * [[register]] on the session first. */
  def wordShingles(tokens: Column, k: Int = 3): Column =
    call_function(fnName, tokens, org.apache.spark.sql.functions.lit(k))
}
