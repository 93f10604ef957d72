package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: print condensed physical plans for named queries (or a
  * default set of the newest ones) — the `.explain` iteration loop the
  * plan-shape work happens in. Usage: runMain graft.PlanDump [names...]
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sf = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val names = if (args.nonEmpty) args.toSeq
      else Seq("q61_line_dedup", "q66_vocab_topk", "q65_scalar_quantize")
    val interesting = Seq("Exchange", "TakeOrdered", "partial_", "Window",
      "Scan parquet", "Generate", "Join", "Sort ")
    for (q <- names) SparkEntry.queries.get(q) match {
      case None =>
        println(s"=== $q: unknown query; available:\n  " +
          SparkEntry.queries.keys.toSeq.sorted.mkString("\n  "))
      case Some(fn) =>
        println(s"=== $q")
        // SPARK_GRAFT_PLAN_FULL=1: emit the untruncated
        // .explain("formatted") text (the plans/rNN deliverable format)
        // instead of the condensed interesting-lines view.
        if (sys.env.get("SPARK_GRAFT_PLAN_FULL").contains("1")) {
          println(fn(spark, sf).queryExecution.explainString(
            org.apache.spark.sql.execution.ExplainMode.fromString("formatted")))
        } else {
        val plan = fn(spark, sf).queryExecution.executedPlan.toString
        val hits = plan.linesIterator
          .filter(l => interesting.exists(l.contains)).toSeq
        // Multi-stage queries (dedup CC, SPARQL closures) end on a
        // checkpointed RDD scan with none of the tokens above — show
        // the plan head instead of an empty (and alarming) block.
        if (hits.nonEmpty) println(hits.mkString("\n"))
        else println(plan.linesIterator.take(8)
          .mkString("(no shuffle/join/scan tokens — plan head)\n", "\n", ""))
        }
    }
    spark.stop()
  }
}
