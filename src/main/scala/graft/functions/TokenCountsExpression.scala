package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Single-pass token counting over the BPE-ish pre-tokenizer.
  *
  * Semantics are EXACTLY `regexp_extract_all(lower(text),
  * '[a-z]+|[0-9]+|[^a-z0-9 ]')` followed by total/distinct/alpha/digit
  * counts (the DuckDB oracle replays that regex form) — but computed as one
  * hand-rolled scan: no regex engine, no token array materialization, no
  * interpreted higher-order functions. The previous composable form paid
  * `regexp_extract_all` + `array_distinct` + 2 × `filter(rlike)` — four
  * passes, two of them launching a regex per token through Catalyst's
  * interpreted HOF machinery — ~8s of the sf0.1 bench; this expression is a
  * straight loop per document.
  *
  * Tokenizer contract (mirrors the regex, over code points):
  *  - runs of `[a-z]` → one alpha token; runs of `[0-9]` → one digit token;
  *  - a space is a separator and never a token;
  *  - ANY other code point (punctuation, tab, newline, non-ASCII) is its
  *    own single-char token.
  */
case class TokenCounts(child: Expression) extends UnaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"token_counts expects string, got ${other.catalogString}")
  }

  override def dataType: DataType = StructType(Seq(
    StructField("n_tokens", IntegerType, nullable = false),
    StructField("n_distinct_tokens", IntegerType, nullable = false),
    StructField("n_alpha_tokens", IntegerType, nullable = false),
    StructField("n_digit_tokens", IntegerType, nullable = false)))

  override def nullSafeEval(input: Any): Any = {
    // toLowerCase on the UTF8String matches SQL lower() exactly
    val s = input.asInstanceOf[UTF8String].toLowerCase.toString
    val n = s.length
    var nTokens = 0; var nAlpha = 0; var nDigit = 0
    val seen = new java.util.HashSet[String]()
    var i = 0
    while (i < n) {
      val c = s.charAt(i)
      if (c == ' ') { i += 1 }
      else if (c >= 'a' && c <= 'z') {
        val start = i
        while (i < n && { val d = s.charAt(i); d >= 'a' && d <= 'z' }) i += 1
        nTokens += 1; nAlpha += 1
        seen.add(s.substring(start, i))
      } else if (c >= '0' && c <= '9') {
        val start = i
        while (i < n && { val d = s.charAt(i); d >= '0' && d <= '9' }) i += 1
        nTokens += 1; nDigit += 1
        seen.add(s.substring(start, i))
      } else {
        // single code point token (surrogate pairs stay together, matching
        // the regex's per-code-point match)
        val cp = s.codePointAt(i)
        val w = Character.charCount(cp)
        nTokens += 1
        seen.add(s.substring(i, i + w))
        i += w
      }
    }
    InternalRow(nTokens, seen.size(), nAlpha, nDigit)
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

object TokenCountsExpression {
  private val fnName = "graft_token_counts"

  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      fnName, exprs => TokenCounts(exprs.head), "scala_udf")

  def tokenCounts(text: Column): Column = call_function(fnName, text)
}
