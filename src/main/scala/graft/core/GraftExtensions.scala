package graft.core

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

/** SparkSessionExtensions wiring for graft's custom Catalyst expressions —
  * the (c)-level integration point: a session built with
  * `GraftSession.builder(...).withExtensions(new GraftExtensions)` (or
  * `spark.sql.extensions=graft.core.GraftExtensions` on spark-submit) has
  * the functions available in SQL without per-session `register` calls.
  * The `register` helpers on each expression object remain for sessions
  * built without extensions.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("graft_cosine_similarity"),
      new ExpressionInfo(classOf[graft.functions.CosineSimilarity].getName,
        "graft_cosine_similarity"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        graft.functions.CosineSimilarity(exprs(0), exprs(1))))
    ext.injectFunction((
      FunctionIdentifier("graft_simhash"),
      new ExpressionInfo(classOf[graft.functions.SimHash].getName, "graft_simhash"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        graft.functions.SimHash(exprs.head)))
  }
}
