package graft

import org.apache.spark.sql.functions._

/** Blanket plan audit across the whole query surface: the scale
  * guarantees that must hold at 100 TB, asserted on every declared query.
  */
class PlanAuditSpec extends SparkSpec {

  // Queries where a broadcast nested loop is the INTENDED shape (tiny
  // broadcast query side against the big corpus, or inequality-only join
  // conditions on small inputs).
  private val nestedLoopAllowed =
    Set("q35_knn_bruteforce", "q36_ann_lsh", "q44_ivf_knn")

  test("no query plan contains a cartesian product") {
    SparkEntry.queries.foreach { case (name, fn) =>
      val plan = fn(spark, sf).queryExecution.executedPlan.toString
      assert(!plan.contains("CartesianProduct"),
        s"$name has a cartesian product:\n$plan")
    }
  }

  test("nested-loop joins only where the broadcast side is intentionally tiny") {
    SparkEntry.queries.foreach { case (name, fn) =>
      val plan = fn(spark, sf).queryExecution.executedPlan.toString
      if (!nestedLoopAllowed(name)) {
        assert(!plan.contains("BroadcastNestedLoopJoin"),
          s"$name has an unplanned nested-loop join:\n$plan")
      }
    }
  }

  test("cube emission stays inside whole-stage codegen") {
    // Regression guard for the round-4 finding: a higher-order function
    // (filter/transform lambda) anywhere in the generator expression drops
    // GenerateExec to interpreted evaluation — 5× slower at sf0.1. A
    // codegen'd Generate prints as "*(n) Generate".
    for (q <- Seq("q37_cube_observations", "q43_cube_full_kinds")) {
      val plan = SparkEntry.queries(q)(spark, sf)
        .queryExecution.executedPlan.toString
      assert("\\*\\(\\d+\\) Generate".r.findFirstIn(plan).isDefined,
        s"$q Generate fell out of codegen:\n$plan")
    }
  }

  test("narrow projections reach the parquet scans (column pruning)") {
    // q02 projects 3 of 6 order columns — the scan must not read more.
    val df = SparkEntry.queries("q02_filter_project")(spark, sf)
    val scan = df.queryExecution.executedPlan.toString
    val readSchema = "ReadSchema: struct<([^>]*)>".r
      .findFirstMatchIn(scan).map(_.group(1)).getOrElse("")
    // 3 projected columns + o_orderstatus (referenced by the filter, which
    // is re-evaluated post-scan even when pushed) — of the table's 6.
    assert(readSchema.split(",").length == 4, s"scan reads too much: $readSchema")
  }

  test("catalog extraction broadcasts the small sides") {
    val plan = operators.CatalogQueries.queries("q38_ckan_packages")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") ||
      plan.contains("BroadcastExchange"), s"no broadcast in q38 plan")
  }
}
