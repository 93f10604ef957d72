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
    Set("q35_knn_bruteforce", "q36_ann_lsh", "q44_ivf_knn",
      // q85 composes q35's brute-force side (its baseline) — same tiny
      // broadcast query sample, same intended NLJ.
      "q85_ann_recall",
      // q91 is q35's shape over int8 codes — same broadcast query side.
      "q91_int8_knn",
      // q93 composes q44's coarse stage — same broadcast centroid NLJ.
      "q93_ivf_int8",
      // q105's two cross joins broadcast SINGLE-ROW aggregates (the
      // total and the leftover) — the canonical scalar-broadcast shape.
      "q105_token_shares",
      // kMeans assignment: corpus streamed once against the broadcast
      // centroid table (k·dim doubles) — the intended IVF/q44 shape.
      // (q64 embeds kMeans too, but behind an eager checkpoint — its
      // RETURNED plan must stay NLJ-free: the pair stage is a
      // cluster-keyed equi-join, and this audit now guards that.)
      "q62_kmeans",
      // q115/q119 cross-join a SINGLE-ROW broadcast (the corpus token
      // total) — the q105 scalar-broadcast shape; the vocab join itself
      // is a keyed equi-join and stays audited.
      "q115_surprisal", "q119_ccnet_split", "q120_bigram_surprisal",
      // q117 composes q35's brute-force side twice (full and truncated)
      // — same tiny broadcast query sample, same intended NLJ.
      "q117_matryoshka_recall",
      // q124's ADC shortlist scans the reconstructed corpus against the
      // broadcast query sample — q35's intended shape over codes.
      "q124_pq_knn",
      // q142 cross-joins a SINGLE-ROW aggregate (the session total) —
      // the q105/q115 scalar-broadcast shape.
      "q142_session_percentiles",
      // q158 cross-joins the SINGLE-ROW corpus token total — the same
      // scalar-broadcast shape; both count joins stay keyed equi-joins.
      "q158_pmi_collocations",
      // q162 cross-joins the SINGLE-ROW max-day aggregate (clips the
      // report-day explode at generation) — the q105/q142 scalar shape.
      "q162_trailing_active_users",
      // q164/q169/q170 cross-join SINGLE-ROW stats aggregates (BM25
      // corpus stats / anomaly mean-variance / TF-IDF N) — the same
      // scalar-broadcast shape.
      "q164_bm25_search", "q169_anomaly_days", "q170_tfidf_terms",
      // q211 serves q164's scoring from the stored index — the same
      // SINGLE-ROW stats scalar broadcast (summed over stats shards).
      "q211_bm25_indexed",
      // q168 composes q35's brute-force side twice (q117's two lists) —
      // same tiny broadcast query sample, same intended NLJ.
      "q168_rrf_fusion",
      // q173/q175/q176 cross-join SINGLE-ROW aggregates (customer
      // count / union-sketch stats / bin total) — the q105 scalar shape.
      "q173_rfm_scores", "q175_kmv_setops", "q176_histogram_quantiles",
      // q213 cross-joins the SINGLE-ROW collapsed sketch summary (the
      // map-only rank lookup's broadcast) — the q105 scalar shape.
      "q213_quantile_normalize",
      // q206 cross-joins the SINGLE-ROW summary total — the same
      // scalar-broadcast shape over the sketch's reporting-sized rows.
      "q206_quantile_sketch",
      // q189 is q175's report served from the persisted merged index —
      // identical single-row-aggregate cross-join shape; q191 likewise
      // serves q176's report from the merged histogram index.
      "q189_kmv_merged", "q191_hist_merged",
      // q200 cross-joins the two 1-row index reports (kmv setops ×
      // hist quantiles) plus their internal scalar broadcasts.
      "q200_index_dashboard",
      // q192/q193 broadcast each BPE round's 1-row argmax pair back into
      // the vocabulary re-segmentation — the q105 scalar shape, ×3.
      "q192_bpe_train", "q193_bpe_fertility",
      // q199/q202's pair enumeration is a non-equi self-join of the
      // DAILY aggregate — both sides are |days|-row reporting tables
      // (30 rows at sf0.1), so the BNLJ is |days|²/2 by construction;
      // q199 adds the 1-row n_pairs scalar broadcast.
      "q199_theilsen_trend", "q202_mann_kendall",
      // q177/q180 cross-join SINGLE-ROW aggregates (CUSUM mean / grand
      // total) — the q105 scalar shape.
      "q177_cusum_changepoints", "q180_contingency_lift",
      // q184 cross-joins SINGLE-ROW totals + the scalar KS max.
      "q184_ks_drift",
      // q227 scans modality B against the broadcast query sample —
      // q35's intended tiny-query NLJ (the documented brute-force eval
      // regime; the IVF serve is the scale path).
      "q227_crossmodal_mate_rank",
      // q229 cross-joins two SINGLE-ROW aggregates (the (m+1)-th-count
      // subtraction and the spill total) over ≤ m+1-row summaries —
      // the q105 scalar-broadcast shape.
      "q229_mg_index",
      // q238: the grid's nprobe-prefix tagging is an 8-row broadcast
      // non-equi join (probe_rank <= nprobe), and the report's cell
      // axes are 8-row/2-row broadcast relations — the q105 class;
      // the ADC/rerank joins themselves stay keyed equi-joins.
      "q238_ivfpq_recall_vs_nprobe")

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

  test("predicate-partitioned triples give Bgp.pattern a pruned scan") {
    // The SCALE.md layout claim, demonstrated: triples written
    // partitioned by predicate turn Bgp.pattern's p-filter into partition
    // pruning — the scan lists only the matching predicate's directory
    // instead of reading all of a 100 TB table.
    val dir = java.nio.file.Files.createTempDirectory("triples_by_p").toString
    try {
      graft.rdf.DerivedGraph.geo(spark, sf)
        .write.partitionBy("p").mode("overwrite").parquet(dir)
      val t = spark.read.parquet(dir)
      val q = graft.graphquery.Bgp.pattern(t, "urn:p/name", "name")
      val scan = q.queryExecution.executedPlan.collectFirst {
        case f: org.apache.spark.sql.execution.FileSourceScanExec => f
      }.getOrElse(fail("no FileSourceScan in plan"))
      assert(scan.partitionFilters.nonEmpty,
        s"p-filter did not become a partition filter:\n${q.queryExecution.executedPlan}")
      // The pruned scan must touch exactly the one predicate partition.
      assert(scan.relation.location.listFiles(scan.partitionFilters, Nil)
        .flatMap(_.files).forall(_.getPath.toString.contains("p=urn")),
        "scan lists files outside the pruned partition")
      // And the filter must not have survived as a data filter on a column
      // the partitioning already resolved.
      assert(q.count() == t.filter(col("p") === "urn:p/name").count())
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
    }
  }

  test("q108's forced fallback is a keyed shuffle join, not a broadcast") {
    // The scale-safe path for a corpus-scale timeline: the packed side
    // must reach the events join as a sort-merge (keyed shuffle) join —
    // no broadcast of the timeline, no nested loop.
    val plan = operators.RelationalQueries
      .queries("q108_asof_timeline_shuffle")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("SortMergeJoin"),
      s"q108 fallback is not a sort-merge join:\n$plan")
    assert(!plan.contains("BroadcastNestedLoopJoin"),
      s"q108 fallback has a nested-loop join:\n$plan")
    assert(!plan.contains("BroadcastHashJoin"),
      s"q108 fallback still broadcasts the timeline:\n$plan")
  }

  test("parsed SPARQL patterns inherit partition pruning on p-partitioned triples") {
    // The string front end must keep the combinators' scale property:
    // a concrete-predicate pattern compiles to a `p === iri` filter that
    // becomes PARTITION pruning on a predicate-partitioned triples
    // table — the parser adds no plan surface between the query string
    // and the pruned scan.
    val dir = java.nio.file.Files.createTempDirectory("triples_by_p2").toString
    try {
      graft.rdf.DerivedGraph.geo(spark, sf)
        .write.partitionBy("p").mode("overwrite").parquet(dir)
      val t = spark.read.parquet(dir)
      val q = graft.graphquery.Sparql.select(t,
        "SELECT ?s ?name WHERE { ?s <urn:p/name> ?name . }")
      val scan = q.queryExecution.executedPlan.collectFirst {
        case f: org.apache.spark.sql.execution.FileSourceScanExec => f
      }.getOrElse(fail("no FileSourceScan in parsed-query plan"))
      assert(scan.partitionFilters.nonEmpty,
        s"parsed pattern's p-filter did not become a partition filter:\n" +
          q.queryExecution.executedPlan)
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
    }
  }

  test("catalog extraction broadcasts the small sides") {
    val plan = operators.CatalogQueries.queries("q38_ckan_packages")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") ||
      plan.contains("BroadcastExchange"), s"no broadcast in q38 plan")
  }
}
