package graft

/** Scratch dump used to generate PlanAuditSpec's exchange-budget map —
  * prints per-query shuffle-exchange counts (excluding BroadcastExchange)
  * plus any cartesian/BNLJ occurrences. Not part of CI assertions. */
class PlanLintDump extends SparkSpec {
  ignore("dump per-query exchange counts") {
    val dir = "/root/testdata/sf0.001"
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        val s = fn(spark, dir).queryExecution.executedPlan.toString
        val ex = "Exchange (hashpartitioning|rangepartitioning|SinglePartition)".r
          .findAllIn(s).length
        val cart = s.contains("CartesianProduct")
        val bnlj = s.contains("BroadcastNestedLoopJoin")
        println(s"LINT $name ex=$ex cart=$cart bnlj=$bnlj")
      } catch {
        case e: Throwable => println(s"LINT $name ERROR ${e.getMessage}")
      }
    }
  }
}
