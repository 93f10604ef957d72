package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Linear-scaling probe (SCALE.md): materializes a 10× replica of the
  * sf0.1 `documents`/`lineitem` tables and times q33/q37/q43 at both
  * scales, single run each, same session.
  *
  * Replication shifts the keys per replica; document text additionally
  * gets every token SUFFIXED with a per-replica tag — a bijective token
  * renaming, so each replica's shingle/jaccard structure is exactly the
  * original's while shingle sets across replicas are disjoint. (Without
  * the renaming every doc near-dup-matches its 9 replicas; inserting
  * separator tokens instead creates "tag word tag" shingles shared by
  * every doc in a replica — both distort the pair count away from 10×
  * the sf0.1 pairs and measure duplication blow-up, not scaling.)
  *
  * Usage: runMain graft.ScaleProbe [outDir] [probeName...]
  * (default /tmp/graft_sf1; SPARK_GRAFT_REPLICAS overrides the 10×
  * factor — e.g. 100 for a two-decade curve; trailing args filter the
  * probe list by substring)
  */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    val sf01 = "/root/testdata/sf0.1"
    val outDir = args.headOption.getOrElse("/tmp/graft_sf1")
    val nameFilter = args.drop(1)
    val replicas = sys.env.getOrElse("SPARK_GRAFT_REPLICAS", "10").toInt
    val label = s"sf${replicas / 10}"
    // Partition count must track the data (SCALE.md: size partitions so
    // the per-task aggregation state fits in memory — at 1000× the span/
    // shingle streams are ~10⁸-10⁹ rows, and 32 partitions would hand
    // each task a multi-GB hash map). Default keeps the historical 32 so
    // earlier probe rows stay comparable; the 1000× runs pass 256.
    val partitions = sys.env.getOrElse("SPARK_GRAFT_PARTITIONS", "32")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", partitions)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def replicate(df: DataFrame, f: (DataFrame, Int) => DataFrame): DataFrame =
      (0 until replicas).map(i => f(df, i)).reduce(_ unionByName _)

    // q60 (the composed pipeline) cannot ride THIS token-suffix replica:
    // its quality gate measures token lengths and English stopwords,
    // which the suffix renaming destroys (the gate would empty the
    // corpus and the "probe" would time an empty pipeline). It gets its
    // own GATE-PRESERVING replica + stage-timed probe further below.
    val probes = Seq("q13_events_hourly", "q33_minhash_neardup",
      "q37_cube_observations", "q48_sessionize_batch",
      "q43_cube_full_kinds", "q51_simhash_neardup",
      "q55_dedup_components",
      "q61_line_dedup", "q62_kmeans", "q64_semdedup",
      "q70_simhash64_neardup", "q73_component_best", "q74_repeated_spans",
      "q76_oov_rate", "q77_contamination_ratio",
      "q78_line_dedup_rebuild", "q79_shingle_novelty",
      "q81_simhash128_neardup", "q82_rank_buckets",
      "q83_token_budget_cap", "q84_split_leakage", "q85_ann_recall",
      "q86_winnowing", "q87_minhash_agreement", "q88_shard_assign",
      "q89_winnow_overlap", "q90_containment", "q91_int8_knn",
      "q92_frequency_spectrum", "q93_ivf_int8", "q94_dup_flow",
      "q95_dup_depth_spectrum", "q96_langid_confusion",
      "q97_gate_ablation", "q98_packing_efficiency",
      "q99_session_spectrum", "q100_corpus_report",
      "q101_bottomk_sample", "q114_train_order",
      "q102_rollup", "q103_json_props",
      "q104_moving_window", "q105_token_shares", "q106_asof_join",
      "q107_asof_timeline", "q108_asof_timeline_shuffle",
      "q188_asof_timeline_chunked",
      "q115_surprisal", "q116_tokenizer_fertility", "q117_matryoshka_recall",
      "q118_bpe_merge_pairs", "q119_ccnet_split", "q120_bigram_surprisal",
      "q121_range_join_hot_windows", "q123_funnel", "q124_pq_knn",
      "q125_asof_forward", "q129_ewma_score", "q130_conversion_cycles",
      "q131_user_journey", "q132_dedup_weights", "q139_heavy_hitters",
      "q141_session_window",
      "q151_scd2_history", "q152_activity_streaks",
      "q156_transition_matrix", "q157_inverted_index",
      "q158_pmi_collocations", "q160_top_paths",
      // Round-12 search/retrieval family. q167 rides the token-suffix
      // replica deliberately: vocabulary grows ~10× AND every word gains
      // 9 distance-1 replica siblings — a worst-case densification of
      // the variant buckets, not just more of the same vocab.
      "q164_bm25_search", "q165_salted_agg", "q167_fuzzy_vocab_pairs",
      "q168_rrf_fusion", "q169_anomaly_days", "q170_tfidf_terms",
      // q174 fk_audit rides the join family (anti-joins over
      // orders/customer/part — replicas not materialized here).
      "q171_peak_concurrency", "q172_copurchase_pairs", "q173_rfm_scores",
      "q175_kmv_setops", "q176_histogram_quantiles",
      "q177_cusum_changepoints", "q178_salted_topk", "q179_table_checksum",
      "q180_contingency_lift",
      "q181_entity_clusters", "q182_also_bought", "q183_boolean_and_search",
      "q184_ks_drift", "q185_id_completeness",
      "q186_latency_percentiles",
      // BPE rides the token-suffix replica: the corpus grows 10× AND the
      // vocabulary grows ~10× (every word gains 9 tagged variants), so
      // this stresses BOTH the one corpus pass and the per-round
      // vocab-table work — the probe should stay ~linear.
      "q192_bpe_train", "q193_bpe_fertility",
      // Round-13 events family: gap-fill grid (bounded output, linear
      // rollup), CMS (bounded cells, linear explode), PIT join (equi
      // join + residual).
      "q194_gapfill_ffill", "q197_cms_counts", "q198_pit_join",
      // Round-14 additions: q203 exercises the index WRITE+MERGE cycle
      // (two sketch aggregations + estimate join — the serving probe is
      // constant-size by construction); q206 is one bucket-keyed window
      // shuffle + summary-sized everything after; q207 is the q74
      // skeleton plus one per-doc position window; q208 is map-only
      // ticket fans + the per-stratum top-k window.
      "q203_cms_index", "q206_quantile_sketch",
      "q207_repeated_intervals", "q208_weighted_sample",
      // q209 is two distinct-aggregations + a broadcast probe; q210 is
      // q207 + a (doc,pos) anti-join + per-doc rebuild; q211 times the
      // shard write + the bucket-pruned serve.
      "q209_bloom_index", "q210_span_excision", "q211_bm25_indexed",
      // q212 is q210 plus the owner filter; q213 is one corpus window
      // shuffle (the sketch) + a map with a broadcast array.
      "q212_excise_canonical", "q213_quantile_normalize",
      // q214 is one keyed window shuffle (the grouped sketch) + a keyed
      // report; q215 is the window-hash skeleton + a broadcast bloom
      // probe + a survivors-only semi-join.
      "q214_grouped_quantiles", "q215_bloom_decontam",
      // q216 is two q214-class sketch passes + a map-only score; q217
      // is one (stratum, bucket)-keyed rank + a broadcast offset join.
      "q216_robust_anomalies", "q217_kfold_assign",
      // Round-15 additions: q218 times the IVF+PQ index BUILD (sign
      // once: centroids + codebook + partitioned codes — the corpus
      // scans) plus the pruned serve on its first touch of each dir;
      // q219/q220 are one/two predicate-sliced scans + a union/anti;
      // q222 is the statGraph derivation + one hash aggregate + a
      // 25-row sort.
      "q218_ivfpq_indexed", "q219_sparql_union", "q220_sparql_minus",
      "q222_sparql_modifiers",
      // q223/q224: predicate-sliced scans + a left join / semi-join +
      // pushed boolean columns — the FILTER surface is row-local.
      "q223_sparql_filter_funcs", "q224_sparql_exists_having",
      // q226: two batch-sized sample windows + a ≤k·|strata| merge;
      // q227: one broadcast-query scan of modality B + a per-qid window
      // (|queries| fixed at corpus%50 — grows with the corpus, the
      // documented brute-force eval regime; the IVF serve is the scale
      // path).
      "q226_bottomk_index", "q227_crossmodal_mate_rank",
      // q229: per-batch summaries are ≤ m+1 rows after one keyed count
      // each — the serve reads |batches|·(m+1) rows; q231's sf1 row
      // includes the one-time model TRAIN on its dir (the q218 note);
      // q232 is one keyed sketch window + a keyed join + a map; q233 is
      // one struct-explode scan + a keyed agg + a 64-slot window.
      "q229_mg_index", "q231_bpe_indexed", "q232_grouped_normalize",
      "q233_column_profile",
      // q234 is one predicate slice + a concat projection; q235 is the
      // q232 sketch + a broadcast bounds join + a map; q236 is the q210
      // skeleton with the cut replaced by a (doc,pos) left join.
      "q234_sparql_bind_concat", "q235_winsorize",
      "q236_span_loss_mask",
      // Round-16 additions: q237 is three predicate-sliced scans (one
      // per GRAPH scope) + two equi-joins — the g filter is pushed, so
      // the named-graph machinery adds no stage; q238 is 8 probe-pruned
      // serves + ONE brute-force side (checkpointed) — run it together
      // with q218 so the shared index build is paid on q218's row.
      "q237_sparql_graph_dataset", "q238_ivfpq_recall_vs_nprobe",
      // Round-17 additions: q241 is the per-graph pointer-doubling
      // closure — depth stays ~log₂(custkey range) as the forest grows
      // (the replica shifts keys, adding TREES not depth), so rounds
      // are constant and each round is one keyed self-join ∝ closure
      // size; q242 is three store rewrites (the documented per-op
      // cost), each a scan + anti-join ∝ store size.
      "q241_sparql_graph_closure", "q242_sparql_update",
      // q245 is a render→write→parse round trip: both sides are
      // embarrassingly parallel line work (the parse kernel holds no
      // cross-line state), so wall should track the dump size ÷ cores;
      // q247 is the DELTA update path over the same base q242 rewrites
      // — its update phase is O(statement), so the q247:q242 ratio at
      // 10× is the whole point of the layout (the row also pays one
      // compact + serve, both ∝ store, keeping the probe honest).
      "q245_nquads_source", "q247_sparql_update_delta",
      // q248 rides the token-suffix replica like the BPE family: corpus
      // 10× AND vocab ~10× — train's token-keyed aggregate and serve's
      // model join both grow, the shape every NB deployment has.
      "q248_nb_classifier",
      // q250 adds the sweep on top of q248's train+serve: the window
      // input is the DISTINCT-score summary, so the extra cost over
      // q248 should stay ~flat as the corpus grows; q252 is q247's
      // shape with graph-op tombstones in the fold (the O(1) cover
      // list must not change the compact/serve scaling).
      "q250_nb_threshold", "q252_graph_mgmt_delta",
      // Round-18 additions: q255 is the X260 expression surface — one
      // self-join + a when-chain/regex projection, so wall should be
      // scan-bound and flat-parallel; q262 adds the embedded-EXISTS
      // flag join (distinct + left outer on the shared key) to the
      // same shape — its ratio vs q255 prices that join at scale.
      "q255_sparql_expr_surface", "q262_sparql_exists_expr",
      // Round-19 additions: q266 is one hash aggregate + a post-agg
      // Extend projection (group-cardinality-sized — free at any
      // corpus size); q267 adds the HAVING flag join on the AGGREGATED
      // frame (distinct + left outer on the group key — both join
      // sides are group-sized after the aggregate; only the witness
      // scan grows with the corpus); q268 is two row-level flag joins
      // — the X269 shape doubled, pricing the per-occurrence cost.
      "q266_sparql_select_expr_postagg", "q267_sparql_having_exists",
      "q268_sparql_bind_exists")
      .filter(q => nameFilter.isEmpty || nameFilter.exists(q.contains))

    // Only materialize the replica tables the selected probes read — a
    // documents-only run must not pay for a 1000× lineitem write.
    val tableFor = Map(
      "q13_events_hourly" -> "events",
      "q48_sessionize_batch" -> "events",
      "q37_cube_observations" -> "lineitem",
      "q43_cube_full_kinds" -> "lineitem",
      "q62_kmeans" -> "embeddings",
      "q64_semdedup" -> "embeddings",
      "q85_ann_recall" -> "embeddings",
      "q91_int8_knn" -> "embeddings",
      "q93_ivf_int8" -> "embeddings",
      "q99_session_spectrum" -> "events",
      "q102_rollup" -> "lineitem",
      "q103_json_props" -> "events",
      "q104_moving_window" -> "events",
      "q106_asof_join" -> "events",
      "q107_asof_timeline" -> "events",
      "q108_asof_timeline_shuffle" -> "events",
      "q188_asof_timeline_chunked" -> "events",
      "q117_matryoshka_recall" -> "embeddings",
      "q121_range_join_hot_windows" -> "events",
      "q123_funnel" -> "events",
      "q124_pq_knn" -> "embeddings",
      "q125_asof_forward" -> "events",
      "q129_ewma_score" -> "events",
      "q130_conversion_cycles" -> "events",
      "q131_user_journey" -> "events",
      "q141_session_window" -> "events",
      "q151_scd2_history" -> "events",
      "q152_activity_streaks" -> "events",
      "q156_transition_matrix" -> "events",
      "q160_top_paths" -> "events",
      "q165_salted_agg" -> "events",
      "q168_rrf_fusion" -> "embeddings",
      "q169_anomaly_days" -> "events",
      "q171_peak_concurrency" -> "events",
      "q172_copurchase_pairs" -> "lineitem",
      "q173_rfm_scores" -> "orders",
      "q175_kmv_setops" -> "events",
      "q176_histogram_quantiles" -> "events",
      "q177_cusum_changepoints" -> "events",
      "q178_salted_topk" -> "events",
      "q179_table_checksum" -> "orders",
      "q182_also_bought" -> "lineitem",
      "q184_ks_drift" -> "events",
      "q185_id_completeness" -> "orders",
      "q186_latency_percentiles" -> "lineitem",
      "q194_gapfill_ffill" -> "events",
      "q197_cms_counts" -> "events",
      "q198_pit_join" -> "events",
      "q203_cms_index" -> "events",
      "q206_quantile_sketch" -> "events",
      "q209_bloom_index" -> "orders",
      "q213_quantile_normalize" -> "events",
      "q214_grouped_quantiles" -> "events",
      "q216_robust_anomalies" -> "events",
      "q218_ivfpq_indexed" -> "embeddings",
      "q219_sparql_union" -> "customer",
      "q220_sparql_minus" -> "customer",
      "q222_sparql_modifiers" -> "customer",
      "q223_sparql_filter_funcs" -> "customer",
      "q224_sparql_exists_having" -> "customer",
      "q227_crossmodal_mate_rank" -> "embeddings",
      "q232_grouped_normalize" -> "events",
      "q233_column_profile" -> "orders",
      "q234_sparql_bind_concat" -> "customer",
      "q235_winsorize" -> "events",
      "q237_sparql_graph_dataset" -> "customer",
      "q238_ivfpq_recall_vs_nprobe" -> "embeddings",
      "q241_sparql_graph_closure" -> "customer",
      "q242_sparql_update" -> "customer",
      "q245_nquads_source" -> "customer",
      "q247_sparql_update_delta" -> "customer",
      "q252_graph_mgmt_delta" -> "customer",
      "q255_sparql_expr_surface" -> "customer",
      "q262_sparql_exists_expr" -> "customer",
      "q266_sparql_select_expr_postagg" -> "customer",
      "q267_sparql_having_exists" -> "customer",
      "q268_sparql_bind_exists" -> "customer")
      .withDefault(_ => "documents")
    val needed = probes.map(tableFor).toSet ++
      // q209 reads customer alongside orders — replicate both.
      (if (probes.contains("q209_bloom_index")) Set("customer") else Set())

    // The replica generators for documents/lineitem are the
    // crossJoin-with-range form: the replica index is a COLUMN, so the
    // plan is O(1) in the replica count (a 1000-way union would build a
    // thousand-child plan and re-scan the parquet per child) — the
    // generator itself follows the engine's own scaling rules.
    val reps = spark.range(replicas.toLong).select(col("id").as("_rep"))

    // SPARK_GRAFT_REUSE=1: probe against replica tables a previous run
    // already wrote to outDir instead of regenerating them — a 1000×
    // documents build is minutes of write the second probe doesn't need.
    val reuse = sys.env.get("SPARK_GRAFT_REUSE").contains("1")
    def fresh(table: String): Boolean = needed(table) &&
      (!reuse || !new java.io.File(s"$outDir/$table.parquet").exists())

    if (fresh("documents")) {
      val docs = spark.read.parquet(s"$sf01/documents.parquet")
      docs.crossJoin(reps).select(
        Seq((col("doc_id") + col("_rep") * 10000000L).as("doc_id"),
          regexp_replace(col("text"), lit("(\\S+)"),
            concat(lit("$1zq"), col("_rep").cast("string"))).as("text")) ++
          docs.columns.filterNot(Set("doc_id", "text")).map(col): _*)
        .write.mode("overwrite").parquet(s"$outDir/documents.parquet")
    }

    // Orders replica: customer shift (the events user-shift analogue) —
    // per-customer recency/frequency/monetary structure is the
    // original's, the customer population grows linearly.
    if (fresh("orders")) {
      spark.read.parquet(s"$sf01/orders.parquet").crossJoin(reps)
        .withColumn("o_orderkey",
          col("o_orderkey") + col("_rep") * 100000000L)
        .withColumn("o_custkey",
          col("o_custkey") + col("_rep") * 100000000L)
        .drop("_rep")
        .write.mode("overwrite").parquet(s"$outDir/orders.parquet")
    }

    // Customer replica: the same custkey shift as the orders replica,
    // so per-replica order↔customer membership structure is exactly the
    // original's (the orderless third stays orderless in every copy).
    if (fresh("customer")) {
      spark.read.parquet(s"$sf01/customer.parquet").crossJoin(reps)
        .withColumn("c_custkey",
          col("c_custkey") + col("_rep") * 100000000L)
        .drop("_rep")
        .write.mode("overwrite").parquet(s"$outDir/customer.parquet")
    }

    if (fresh("lineitem")) {
      spark.read.parquet(s"$sf01/lineitem.parquet").crossJoin(reps)
        .withColumn("l_orderkey",
          col("l_orderkey") + col("_rep") * 100000000L)
        .drop("_rep")
        .write.mode("overwrite").parquet(s"$outDir/lineitem.parquet")
    }

    // Events replica: per-replica USER shift — sessions are per-user
    // gap runs, so shifting user ids multiplies the user population and
    // every session statistic scales exactly linearly (timestamps are
    // untouched; within-user gap structure is the original's).
    def eventsReplica = spark.read.parquet(s"$sf01/events.parquet")
      .crossJoin(reps)
      .withColumn("user_id", col("user_id") + col("_rep") * 100000000L)
      .withColumn("event_id", col("event_id") + col("_rep") * 1000000000L)
      .drop("_rep")
    if (fresh("events")) {
      eventsReplica.write.mode("overwrite").parquet(s"$outDir/events.parquet")
    }

    // Embeddings replica: per-replica SIGN-FLIP isometry (dimension j
    // negated iff bit j of a replica-specific pattern is set) — the
    // vector-space analogue of the token renaming: norms and all
    // within-replica angles are exactly preserved, while cross-replica
    // cosines decorrelate, so cluster structure scales instead of every
    // vector gaining 9 semantic duplicates. Stays on the union generator:
    // the golden-ratio pattern multiply WRAPS on Long — well-defined in
    // Scala, an ARITHMETIC_OVERFLOW under ANSI Column semantics.
    if (fresh("embeddings")) {
      val emb = spark.read.parquet(s"$sf01/embeddings.parquet")
      replicate(emb, (d, i) => {
        // 64-bit golden-ratio mixing: every dimension gets its own pattern
        // bit (a 32-bit pattern would mirror the sign mask across the two
        // 32-dim halves, leaving half-symmetric vectors correlated across
        // replicas).
        val pattern = i * 0x9E3779B97F4A7C15L
        val signs = array((0 until 64).map(j =>
          lit(if (((pattern >> j) & 1L) == 1L) -1.0f else 1.0f)): _*)
        d.select(
          (col("vec_id") + i.toLong * 10000000L).as("vec_id"),
          zip_with(col("embedding"), signs, (x, s) => x * s).as("embedding"),
          col("label"))
      }).write.mode("overwrite").parquet(s"$outDir/embeddings.parquet")
    }
    // q237 reads the geo graph (nation/region) beside the replicated
    // customer table. The dims stay constant-size by design — they are
    // the broadcast side of every BGP join, and a 10× corpus does not
    // grow a country list — so they copy verbatim.
    if (probes.exists(Set("q237_sparql_graph_dataset",
        "q242_sparql_update", "q245_nquads_source",
        "q247_sparql_update_delta", "q252_graph_mgmt_delta")))
      Seq("nation", "region").foreach { tbl =>
        if (!reuse || !new java.io.File(s"$outDir/$tbl.parquet").exists())
          spark.read.parquet(s"$sf01/$tbl.parquet")
            .write.mode("overwrite").parquet(s"$outDir/$tbl.parquet")
      }

    // warmup (codegen) at the small scale, unrecorded
    probes.foreach(q =>
      SparkEntry.queries(q)(spark, sf01).write.format("noop")
        .mode("overwrite").save())
    for (q <- probes; (scale, dir) <- Seq("sf0.1" -> sf01, label -> outDir)) {
      val t0 = System.nanoTime()
      SparkEntry.queries(q)(spark, dir)
        .write.format("noop").mode("overwrite").save()
      println(f"PROBE $q $scale ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }

    // Zipf/hot-key probe for the per-key window family (q48/q99 session
    // windows, q106/q107/q108 as-of forms): the uniform user-shift
    // replica above says nothing about a power-law reality where one
    // user owns a constant fraction of all events — a per-user window
    // then has ONE partition carrying that fraction, and wall time is
    // bounded below by that straggler regardless of cluster size. This
    // probe builds a same-volume skewed twin (every 10th event collapses
    // onto user 0 → the hot key holds 10% of the corpus at any scale)
    // and times the family on uniform-vs-zipf so SCALE.md records the
    // failure shape, not a guess. Select with a `skew` filter arg.
    if (nameFilter.isEmpty || nameFilter.exists(f =>
        f.contains("skew") && !f.contains("docskew"))) {
      val skewDir = s"$outDir/skew"
      if (!reuse || !new java.io.File(s"$skewDir/events.parquet").exists()) {
        eventsReplica
          .withColumn("user_id",
            when(col("event_id") % 10 === 0, lit(0L)).otherwise(col("user_id")))
          .write.mode("overwrite").parquet(s"$skewDir/events.parquet")
        if (!new java.io.File(s"$outDir/events.parquet").exists())
          eventsReplica.write.mode("overwrite")
            .parquet(s"$outDir/events.parquet")
      }
      val skewProbes = Seq("q48_sessionize_batch", "q99_session_spectrum",
        "q106_asof_join", "q107_asof_timeline", "q108_asof_timeline_shuffle",
        // q188 is the chunked mitigation under probe: the hot key's
        // timeline splits across hourly buckets, so max row size is
        // bounded by bucket width × peak rate, not corpus share.
        "q188_asof_timeline_chunked",
        // q123 packs one array per user — the hot key's 10% of the corpus
        // lands in ONE row; probed here for the same reason as q107.
        "q123_funnel",
        // q171 embeds q48's per-user session stage before its per-day
        // sweep — the hot user's window partition is the exposure.
        "q171_peak_concurrency")
      skewProbes.foreach(q => SparkEntry.queries(q)(spark, sf01)
        .write.format("noop").mode("overwrite").save()) // codegen warmup
      for (q <- skewProbes;
           (scale, dir) <- Seq(s"$label-uniform" -> outDir,
             s"$label-zipf10pct" -> skewDir)) {
        val t0 = System.nanoTime()
        SparkEntry.queries(q)(spark, dir)
          .write.format("noop").mode("overwrite").save()
        println(f"PROBE $q $scale ${(System.nanoTime() - t0) / 1e9}%.2f s")
      }
    }

    // Mega-document probe for the per-doc window family (q74 spans,
    // q207 intervals, q210/q212 excision): the uniform token-suffix
    // replica says nothing about ONE document carrying a corpus-scale
    // share of the tokens — the islands window and the excision rebuild
    // both partition by doc, so wall time is bounded below by the
    // biggest doc. This twin replaces one replica's docs with a single
    // document concatenating all their texts (same total token volume,
    // one hot doc ~1/replicas of the corpus) and times the family on
    // uniform-vs-megadoc. Select with a `docskew` filter arg.
    if (nameFilter.exists(_.contains("docskew"))) {
      val skewDir = s"$outDir/docskew"
      if (!reuse ||
          !new java.io.File(s"$skewDir/documents.parquet").exists()) {
        val uni = spark.read.parquet(s"$outDir/documents.parquet")
        val mega = uni.filter(col("doc_id") % replicas.toLong === 0)
          .agg(concat_ws(" ", collect_list(col("text"))).as("text"))
          .select(lit(990000000L).as("doc_id"), col("text"))
        uni.filter(col("doc_id") % replicas.toLong =!= 0)
          .select(col("doc_id"), col("text"))
          .unionByName(mega)
          .write.mode("overwrite").parquet(s"$skewDir/documents.parquet")
      }
      val dsProbes = Seq("q74_repeated_spans", "q207_repeated_intervals",
        "q210_span_excision", "q212_excise_canonical")
      dsProbes.foreach(q => SparkEntry.queries(q)(spark, sf01)
        .write.format("noop").mode("overwrite").save()) // codegen warmup
      for (q <- dsProbes;
           (scale, dir) <- Seq(s"$label-uniform" -> outDir,
             s"$label-megadoc" -> skewDir)) {
        val t0 = System.nanoTime()
        SparkEntry.queries(q)(spark, dir)
          .write.format("noop").mode("overwrite").save()
        println(f"PROBE $q $scale ${(System.nanoTime() - t0) / 1e9}%.2f s")
      }
    }

    // q122 pagerank probe — its own replica: the trade graph's edge list
    // (RelationalQueries.tradeGraphEdges, shared verbatim with the gated
    // query) with BOTH endpoints prefixed by the replica index, giving
    // `replicas` fully disjoint copies of the graph — per-node rank
    // structure is exactly the original's, so a linear wall-time ratio
    // means the iteration shape scales and any super-linearity is the
    // engine's, not the graph's. (The uniform lineitem/orders replicas
    // can't be reused here: they shift order keys but share supplier and
    // nation nodes, which would densify hubs instead of scaling the
    // graph.)
    if (nameFilter.isEmpty ||
        nameFilter.exists(f => "q122_pagerank".contains(f) ||
          "q127_triangles".contains(f) || "q166_bfs_hops".contains(f))) {
      val e1 = graft.operators.RelationalQueries.tradeGraphEdges(spark, sf01)
        .localCheckpoint()
      val eN = e1.crossJoin(reps)
        .select(concat(col("_rep"), lit("_"), col("src")).as("src"),
          concat(col("_rep"), lit("_"), col("dst")).as("dst"))
        .localCheckpoint()
      def timeRank(scale: String, e: DataFrame): Unit = {
        val t0 = System.nanoTime()
        graft.graphquery.Graph.pageRank(e, "src", "dst", iters = 5)
          .write.format("noop").mode("overwrite").save()
        println(f"PROBE q122_pagerank $scale ${(System.nanoTime() - t0) / 1e9}%.2f s")
      }
      timeRank("warmup", e1) // codegen warmup, unrecorded (printed anyway)
      timeRank("sf0.1", e1)
      timeRank(label, eN)
      def timeTri(scale: String, e: DataFrame): Unit = {
        val t0 = System.nanoTime()
        graft.graphquery.Graph.triangleCounts(e, "src", "dst")
          .write.format("noop").mode("overwrite").save()
        println(f"PROBE q127_triangles $scale ${(System.nanoTime() - t0) / 1e9}%.2f s")
      }
      timeTri("sf0.1", e1)
      timeTri(label, eN)
      // BFS over the disjoint-copy replica: the reachable set stays
      // replica 0's (single-source by contract), so what this measures
      // is the per-round cost of frontier⋈edges against a 10× edge
      // list — the honest bound for BFS at scale, where each round's
      // wall is the edge-side scan, parallelized across executors on a
      // real cluster.
      def timeBfs(scale: String, e: DataFrame, src: String): Unit = {
        val t0 = System.nanoTime()
        graft.graphquery.Graph.bfsHops(e, "src", "dst", src)
          .write.format("noop").mode("overwrite").save()
        println(f"PROBE q166_bfs_hops $scale ${(System.nanoTime() - t0) / 1e9}%.2f s")
      }
      timeBfs("sf0.1", e1, "n0")
      timeBfs(label, eN, "0_n0")
    }

    // q60 flagship probe — needs its own GATE-PRESERVING replica: the
    // token-suffix renaming above lengthens every token (avg_len leaves
    // [3.5, 5.0]) and erases English stopwords (ratio < 0.03), so the
    // quality gate would empty the corpus and the probe would time an
    // empty pipeline. Instead, each replica applies a LENGTH-PRESERVING
    // bijection to every NON-stopword token: token lengths, whitespace,
    // stopword occurrences, and bigram-repetition structure are all
    // preserved, while non-stopword token images under distinct
    // bijections are disjoint in practice (an 8-token span or
    // 0.8-jaccard shingle set colliding across bijections would need
    // many simultaneous single-token coincidences), so dedup and
    // decontamination structure scales instead of every doc gaining N−1
    // twins. The family composes three independent involution axes —
    // Caesar rotation (26) × atbash reflection (2) × whole-word reversal
    // (2) = 104 distinct bijections, enough for a 100× probe.
    //
    // Caveat the hard assert below exists for: a non-stopword token's
    // IMAGE can itself land on a stopword ('b' → 'a' under shift 25),
    // nudging that replica's stopword ratio — preservation is a
    // statistical fact about this corpus, not a theorem. The probe
    // therefore VERIFIES gate parity per run instead of assuming it:
    // if survivors are not exactly replicas × the sf0.1 count, the
    // replica is distorting the workload and the run aborts.
    if (nameFilter.isEmpty ||
        nameFilter.exists("q60_curation_pipeline".contains)) {
      require(replicas <= 104,
        s"q60 gate replica supports at most 104 replicas (got $replicas)")
      val gateDir = s"$outDir/q60gate"
      val docs = spark.read.parquet(s"$sf01/documents.parquet")
      val stop = graft.llm.TextAnalysis.stopwords("en")
      val abc = "abcdefghijklmnopqrstuvwxyz"
      replicate(docs, (d, i) => {
        val rot = abc.drop(i % 26) + abc.take(i % 26)
        val alpha = if ((i / 26) % 2 == 1) rot.reverse else rot
        val wordRev = (i / 52) % 2 == 1
        d.select(Seq(
          (col("doc_id") + i.toLong * 10000000L).as("doc_id"),
          array_join(transform(split(trim(col("text")), "\\s+"),
            t => when(t.isin(stop: _*), t).otherwise {
              val m = translate(t, abc, alpha)
              if (wordRev) reverse(m) else m
            }),
            " ").as("text")) ++
          docs.columns.filterNot(Set("doc_id", "text")).map(col): _*)
      }).write.mode("overwrite").parquet(s"$gateDir/documents.parquet")

      def gateSurvivors(dir: String): Long =
        spark.read.parquet(s"$dir/documents.parquet")
          .filter(graft.llm.TextAnalysis.corpusGateFlags(col("text"))
            .getField("keep")).count()
      val (base, repl) = (gateSurvivors(sf01), gateSurvivors(gateDir))
      require(repl == base * replicas,
        s"gate replica distorts the quality gate: $base sf0.1 survivors " +
          s"× $replicas replicas != $repl — bijection/stopword collision")
      println(s"PROBE q60_gate_parity $base x $replicas = $repl OK")

      // Stage-timed run of the EXACT q60 body: LlmQueries.curationPipeline
      // is shared verbatim between the gated query and this probe, with
      // the stage hook timing each materialization boundary here (the
      // checkpointed stages are eager; the final lazy stage is forced
      // with a noop write inside its timing window).
      def q60Stages(dir: String, scale: String): Unit = {
        def timed(stage: String, f: () => DataFrame): DataFrame = {
          val t0 = System.nanoTime()
          val df = f()
          if (stage == "rates+sample+pack")
            df.write.format("noop").mode("overwrite").save()
          if (scale != "warmup")
            println(f"PROBE q60_stage:$stage $scale " +
              f"${(System.nanoTime() - t0) / 1e9}%.2f s")
          df
        }
        graft.operators.LlmQueries.curationPipeline(
          spark.read.parquet(s"$dir/documents.parquet")
            .select(col("doc_id"), col("lang"), col("text")),
          timed)
      }
      q60Stages(sf01, "warmup") // codegen + scan warmup, unrecorded
      q60Stages(sf01, "sf0.1")
      q60Stages(gateDir, label)
    }
    spark.stop()
  }
}
