package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.{array, call_function, lit}
import org.apache.spark.sql.types._

/** Native blocklist hit counter over a token array: the number of tokens
  * whose lowercase form is in `words`. One tight loop per row against a
  * precomputed hash set — the q229 filter's hot kernel, replacing an
  * explode + doc-keyed count shuffle (every token on the wire) with a
  * narrow zero-shuffle scan. CodegenFallback like [[WordShingles]]: the
  * eval is a single loop with no per-element expression-tree walk.
  *
  * Matching contract: tokens compare via `UTF8String.toLowerCase`, the
  * exact semantics of SQL `lower()` — so `blocklistCount(tokens(text))`
  * equals the count of `lower()`-ed exploded tokens landing in the list
  * (asserted against the explode form in ClassifierAuditSpec). */
case class BlocklistCount(child: Expression, words: Seq[String])
    extends UnaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"blocklist_count expects array<string>, got ${other.catalogString}")
  }

  override def dataType: DataType = LongType

  @transient private lazy val set: java.util.HashSet[String] = {
    val s = new java.util.HashSet[String](words.size * 2)
    words.foreach(w => s.add(w.toLowerCase))
    s
  }

  override def nullSafeEval(input: Any): Any = {
    val toks = input.asInstanceOf[ArrayData]
    val n = toks.numElements()
    var hits = 0L
    var i = 0
    while (i < n) {
      if (!toks.isNullAt(i) &&
        set.contains(toks.getUTF8String(i).toLowerCase.toString)) hits += 1L
      i += 1
    }
    hits
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

object BlocklistExpression {

  private val fnName = "graft_blocklist_count"

  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      fnName,
      exprs => {
        // the word list is baked into the expression at plan time, so it
        // must be a foldable array<string> — fail with a clear analysis
        // error instead of an opaque ClassCastException on eval()
        val wordsExpr = exprs(1)
        val ok = wordsExpr.foldable && (wordsExpr.dataType match {
          case org.apache.spark.sql.types.ArrayType(
            org.apache.spark.sql.types.StringType, _) => true
          case _ => false
        })
        if (!ok) throw new org.apache.spark.sql.AnalysisException(
          "USER_RAISED_EXCEPTION",
          Map("errorMessage" ->
            (s"$fnName: second argument (words) must be a literal " +
              s"array<string>, got ${wordsExpr.dataType.simpleString} " +
              s"(foldable=${wordsExpr.foldable})")),
          Option.empty[Throwable])
        val ws = wordsExpr.eval().asInstanceOf[ArrayData]
        val words = (0 until ws.numElements())
          .map(i => ws.getUTF8String(i).toString)
        BlocklistCount(exprs.head, words)
      },
      "scala_udf")

  /** Hit count of `words` (case-insensitive) in a token-array column.
    * Call [[register]] on the session first. */
  def blocklistCount(tokens: Column, words: Seq[String]): Column =
    call_function(fnName, tokens, array(words.map(lit): _*))
}
