package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.llm.Dedup

/** Incremental dedup-index probe at sf1 (SCALE.md): the X24 ingest shape —
  * sign the corpus ONCE into bucketed band/shingle tables, then probe each
  * arriving batch against the stored index — measured against the naive
  * alternative of re-running the full near-dup job over corpus ∪ batch per
  * batch. Reuses (or materializes) the ScaleProbe 10× documents replica.
  *
  * Prints, at sf1 (~10× the sf0.1 corpus):
  *   - one-time signing wall time,
  *   - per-batch probe wall time and hit count (3 batches),
  *   - the naive full re-sign wall time for one batch (the cost the index
  *     amortizes away),
  *   - the candidate-join exchange count with auto-broadcast disabled
  *     (expected 1: the batch side shuffles into the index's (_band,_bh)
  *     bucketing; the index is scanned in place).
  *
  * Usage: runMain graft.IndexProbe [sf1Dir]   (default /tmp/graft_sf1)
  */
object IndexProbe {
  def main(args: Array[String]): Unit = {
    val sf01 = "/root/testdata/sf0.1"
    val outDir = args.headOption.getOrElse("/tmp/graft_sf1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.warehouse.dir", s"$outDir/warehouse")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"PROBE $label ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    // 10× replica with the ScaleProbe bijective token renaming (replica
    // shingle structures identical to the original, mutually disjoint).
    val docsPath = s"$outDir/documents.parquet"
    if (!new java.io.File(docsPath).exists()) {
      val d01 = spark.read.parquet(s"$sf01/documents.parquet")
      (0 until 10).map(i => d01.select(
          (col("doc_id") + i.toLong * 10000000L).as("doc_id"),
          regexp_replace(col("text"), "(\\S+)", "$1zq" + i).as("text")))
        .reduce(_ unionByName _)
        .write.mode("overwrite").parquet(docsPath)
    }
    val docs = spark.read.parquet(docsPath)
      .select(col("doc_id"), col("text"))
    println(s"PROBE corpus_docs ${docs.count()}")

    spark.sql("DROP TABLE IF EXISTS p1_bands")
    spark.sql("DROP TABLE IF EXISTS p1_shingles")
    time("sign_corpus_once")(
      Dedup.writeDedupIndex(docs, "doc_id", "text", "p1"))

    // Three ingest batches: near-copies (one appended token) of every
    // 300th doc with a per-batch offset, plus fresh no-match docs
    // (~334 docs per batch at the 50k corpus).
    def batch(b: Int) = {
      // Offsets far above any replica id (replica r shifts by r·10⁷, so
      // a 100× corpus tops out near 10⁹) — batch ids must never collide
      // with corpus ids.
      val nearCopies = docs.filter(col("doc_id") % 300 === b)
        .select((col("doc_id") + 10000000000L + b * 1000000L).as("doc_id"),
          concat(col("text"), lit(s" xj$b")).as("text"))
      val fresh = docs.filter(col("doc_id") % 300 === 100 + b)
        .select((col("doc_id") + 20000000000L + b * 1000000L).as("doc_id"),
          // fully rewritten tokens -> shares no shingle with the corpus
          regexp_replace(col("text"), "(\\S+)", s"fr$b").as("text"))
      nearCopies.unionByName(fresh).localCheckpoint(true)
    }
    for (b <- 0 until 3) {
      val bt = batch(b)
      val n = bt.count()
      val hits = time(s"probe_batch_$b(n=$n)")(
        Dedup.dedupAgainstIndex(bt, "doc_id", "text", spark, "p1"))
      println(s"PROBE batch_${b}_hits ${hits.count()}")
    }

    // The cost the index amortizes away: full near-dup job over
    // corpus ∪ batch (what per-batch ingest would pay WITHOUT the index).
    val bt = batch(0)
    time("naive_full_resign_one_batch")(
      Dedup.minhashNearDups(docs.unionByName(bt), "doc_id", "text").count())

    // Dashboard form: corpus-self near-dup pairs FROM the index alone
    // (indexNearDups — zero corpus scan, bucket-local band self-join)
    // vs re-deriving the whole chain, the q60/q100 per-run cost.
    val nIdx = time("dashboard_pairs_from_index")(
      Dedup.indexNearDups(spark, "p1").count())
    val nFull = time("dashboard_pairs_rederived")(
      Dedup.minhashNearDups(docs, "doc_id", "text").count())
    println(s"PROBE dashboard_pair_parity index=$nIdx rederived=$nFull " +
      (if (nIdx == nFull) "OK" else "MISMATCH"))

    // Plan shape at sf1: candidate join = ONE batch-side exchange on the
    // index's bucketed (_band, _bh) key, index scanned in place (broadcast
    // disabled to surface the layout the bucketing exists for).
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    val candPlan = Dedup.bandTable(
        Dedup.hashedShingles(bt, "doc_id", "text")).as("n")
      .join(spark.table("p1_bands").as("i"),
        col("n._band") === col("i._band") && col("n._bh") === col("i._bh"))
      .queryExecution.executedPlan.toString
    val exchanges = "hashpartitioning\\(_band".r.findAllIn(candPlan).length
    println(s"PROBE candidate_join_band_exchanges $exchanges (expect 1)")
    spark.stop()
  }
}
