package graft

/** Scratch dump used to generate PlanAuditSpec's exchange-budget map —
  * prints per-query shuffle-exchange counts (excluding BroadcastExchange)
  * plus any cartesian/BNLJ occurrences. Not part of CI assertions. */
class PlanLintDump extends SparkSpec {
  // opt-in: set GRAFT_PLAN_DUMP=all or a comma-separated query-name list
  // and run `testOnly graft.PlanLintDump` — stays ignored in plain CI runs
  private val wanted = sys.env.get("GRAFT_PLAN_DUMP")
  private def dumpTest(name: String)(body: => Unit): Unit =
    if (wanted.isDefined) test(name)(body) else ignore(name)(body)
  dumpTest("dump per-query exchange counts") {
    val dir = "/root/testdata/sf0.001"
    val selected = wanted match {
      case Some("all") | None => SparkEntry.queries
      case Some(names) =>
        val set = names.split(",").map(_.trim).toSet
        SparkEntry.queries.filter { case (n, _) => set(n) }
    }
    selected.toSeq.sortBy(_._1).foreach { case (name, fn) =>
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
