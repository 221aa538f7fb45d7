package graft

/** Diagnostic main: print the join/exchange skeleton of registry query
  * plans — the at-scale audit loop (`sbt "Test/runMain graft.PlanAudit
  * q_x q_y"`, no args = a default set of recently-touched queries).
  */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val names = if (args.nonEmpty) args.toSeq
      else Seq("q_dedup_jaccard", "q_text_decontaminate", "q_sim_ann_lsh",
        "q_sim_ann_ivf", "q_curate")
    names.foreach { n =>
      val p = Registry.byName(n).df(TestSpark.spark, TestSpark.sf)
        .queryExecution.executedPlan.toString
      println(s"=== $n ===")
      println(p.linesIterator
        .filter(l => l.contains("Join") || l.contains("Exchange") ||
          l.contains("Cartesian") || l.contains("NestedLoop"))
        .map(_.trim.replaceAll("\\[plan_id=\\d+\\]", "").take(150))
        .mkString("\n"))
    }
    TestSpark.spark.stop()
  }
}
