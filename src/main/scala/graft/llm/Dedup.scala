package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deduplication operators: exact (fingerprint group), MinHash+LSH banded
  * near-dup, SimHash signatures, n-gram Jaccard verification.
  *
  * Scale design (the whole point): near-dup candidate generation NEVER
  * all-pairs-joins the corpus. MinHash signatures band into
  * (band_id, band_hash) buckets; only same-bucket docs pair up — the
  * classic shingle→minhash→band→bucket-join shape. At 100 TB the band
  * explode is 32 rows/doc (map-side), the bucket join shuffles on the
  * band hash, and the exact-Jaccard verify touches only candidates.
  * Skewed buckets (boilerplate docs) would be salted/AQE-handled; an
  * explicit bucket-size cap is the standard guard.
  */
object Dedup {

  /** Distinct word k-gram shingles. Documents shorter than k tokens yield
    * their single sub-k shingle.
    */
  def shingles(text: Column, k: Int = 3): Column = {
    val toks = TextAnalysis.tokens(text)
    array_distinct(transform(
      sequence(lit(1), greatest(size(toks) - (k - 1), lit(1))),
      i => concat_ws(" ", slice(toks, i, lit(k)))))
  }

  /** MinHash signature: `n` minimums of per-shingle seeded xxhash64. */
  def minhash(shingleCol: Column, n: Int = 128): Column =
    array((0 until n).map(i =>
      array_min(transform(shingleCol, s => xxhash64(s, lit(i))))): _*)

  /** Per-shingle base hash array, masked to 32 bits: the two independent
    * hash families h1/h2 from which every minhash slot derives as
    * h_i = h1 + i·h2 (the standard affine combination — one permutation
    * family per slot without re-hashing the string per slot). The 32-bit
    * mask keeps h1 + 127·h2 < 2⁴⁰, safely inside ANSI long arithmetic.
    */
  def shingleHashes(shingleCol: Column, seed: Int): Column =
    transform(shingleCol, s => xxhash64(s, lit(seed))
      .bitwiseAND(lit(0xFFFFFFFFL)))

  /** LSH band hashes from the PRECOMPUTED h1/h2 base-hash arrays: band b's
    * hash fuses `rowsPerBand` slot minimums, each an arithmetic-only
    * zip_with over the base hashes — the per-shingle string hashing happens
    * exactly twice per document (in [[shingleHashes]], materialized by the
    * caller's cache), not once per slot.
    *
    * Deliberately NOT `element_at(minhash(sh), i)`: Catalyst inlines the
    * shared 128-slot array expression into every element_at (projection
    * collapse defeats subexpression reuse across higher-order functions),
    * re-evaluating the whole signature per slot — a 128× blowup that took
    * the sf0.1 bench from seconds to 20 minutes. The same hazard is why
    * h1/h2 must come from a materialized column, not be inlined here.
    */
  def lshBands(h1: Column, h2: Column, bands: Int = 32,
               rowsPerBand: Int = 4): Column =
    array((0 until bands).map { b =>
      val slots = (0 until rowsPerBand).map { r =>
        val i = b * rowsPerBand + r
        array_min(zip_with(h1, h2, (a, c) => a + lit(i.toLong) * c))
      }
      struct(lit(b).as("band"), xxhash64(slots: _*).as("bh"))
    }: _*)

  /** Exact n-gram Jaccard over two distinct-shingle arrays:
    * |A∩B| / |A∪B| — integer sizes, so cross-engine deterministic.
    */
  def jaccard(a: Column, b: Column): Column =
    size(array_intersect(a, b)).cast("double") /
      (size(a) + size(b) - size(array_intersect(a, b)))

  /** Banded-LSH near-duplicate pairs with exact-Jaccard verification.
    *
    * Returns (d1, d2, jaccard) with d1 < d2 and jaccard >= threshold.
    * With 32 bands × 4 rows the per-pair miss probability at j=0.8 is
    * (1-0.8⁴)³² ≈ 5e-8 — recall is effectively exact, which is what lets
    * the DuckDB oracle verify this against all-pairs Jaccard.
    */
  def minhashNearDups(docs: DataFrame, idCol: String, textCol: String,
                      threshold: Double = 0.8,
                      maxBucketSize: Int = Int.MaxValue): DataFrame = {
    // cache(): the base-hash arrays feed 128 slot expressions plus the
    // verify joins read the shingles — without the materialization barrier,
    // projection collapse would recompute the tokenize+hash pipeline inside
    // each slot.
    val withShingles = docs.select(col(idCol).as("_id"),
      shingles(col(textCol)).as("_sh"))
      .withColumn("_h1", shingleHashes(col("_sh"), 0))
      .withColumn("_h2", shingleHashes(col("_sh"), 1))
      .cache()
    val verified = nearDupPairs(withShingles, threshold, maxBucketSize)
    // Materialize the (small) pair set eagerly so the shingle cache can be
    // released before returning — in a long-lived session the per-call
    // cached shingle blocks would otherwise accumulate in storage memory.
    // localCheckpoint blocks are ContextCleaner-GC'd with the DataFrame.
    try verified.localCheckpoint(true) finally withShingles.unpersist(false)
  }

  /** Lazy variant for plan inspection (tests assert the candidate stage
    * never degenerates to an all-pairs join): full lineage, no cache or
    * checkpoint barrier, so do not execute it — use [[minhashNearDups]].
    */
  private[graft] def minhashNearDupsPlan(docs: DataFrame, idCol: String,
                                         textCol: String,
                                         threshold: Double = 0.8): DataFrame =
    nearDupPairs(docs.select(col(idCol).as("_id"),
      shingles(col(textCol)).as("_sh"))
      .withColumn("_h1", shingleHashes(col("_sh"), 0))
      .withColumn("_h2", shingleHashes(col("_sh"), 1)),
      threshold, Int.MaxValue)

  private def nearDupPairs(withShingles: DataFrame, threshold: Double,
                           maxBucketSize: Int): DataFrame = {
    val bandedAll = withShingles
      .select(col("_id"), explode(lshBands(col("_h1"), col("_h2"))).as("_b"))
      .select(col("_id"), col("_b.band").as("_band"), col("_b.bh").as("_bh"))
    // OPT-IN skew guard: a bucket of n docs yields n² candidate pairs, so
    // one boilerplate mega-bucket can dominate the job at corpus scale.
    // NOTE the trade-off: identical shingle sets share the SAME bucket in
    // EVERY band, so an over-cap group of exact duplicates loses ALL its
    // pairs, not just some — run [[exactDups]] first and near-dup only the
    // canonical representatives (the standard pipeline order), or leave
    // the default no-op cap to keep all-pairs-equivalent recall.
    // Window count, not agg+join: one shuffle, no re-evaluation of the
    // expensive band explode (same pattern as exactDups below).
    val banded =
      if (maxBucketSize == Int.MaxValue) bandedAll
      else bandedAll
        .withColumn("_bn", count(lit(1))
          .over(Window.partitionBy(col("_band"), col("_bh"))))
        .filter(col("_bn") <= maxBucketSize)
        .drop("_bn")
    val candidates = banded.as("l")
      .join(banded.as("r"),
        col("l._band") === col("r._band") && col("l._bh") === col("r._bh") &&
          col("l._id") < col("r._id"))
      .select(col("l._id").as("d1"), col("r._id").as("d2"))
      .distinct()
    candidates
      .join(withShingles.select(col("_id"), col("_sh").as("_sh1")),
        col("d1") === col("_id")).drop("_id")
      .join(withShingles.select(col("_id"), col("_sh").as("_sh2")),
        col("d2") === col("_id")).drop("_id")
      .select(col("d1"), col("d2"), jaccard(col("_sh1"), col("_sh2")).as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }

  /** Exact-duplicate grouping on the normalized-text fingerprint: adds
    * (fp, group_size, canonical_id) — canonical = min id per group. One
    * shuffle (window on fp).
    */
  def exactDups(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val w = Window.partitionBy(col("fp"))
    docs.withColumn("fp", TextAnalysis.fingerprint(col(textCol)))
      .withColumn("group_size", count(lit(1)).over(w))
      .withColumn("canonical_id", min(col(idCol)).over(w))
  }

  /** 32-bit SimHash as a fully relational pipeline (explode tokens × bits,
    * two aggregations) — identical shape in the DuckDB oracle. Token hash
    * = first 8 hex digits of md5, so both engines agree bit-for-bit.
    */
  def simhash(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val tok = docs.select(col(idCol).as("_id"),
      explode(TextAnalysis.tokens(col(textCol))).as("_t"))
      .withColumn("_h", conv(substring(md5(col("_t")), 1, 8), 16, 10).cast("long"))
    val bits = tok.select(col("_id"), col("_h"),
      explode(sequence(lit(0), lit(31))).as("_b"))
      .withColumn("_bit", floor(col("_h") / pow(lit(2.0), col("_b"))).cast("long") % 2)
    bits.groupBy(col("_id"), col("_b"))
      .agg(sum(col("_bit") * 2 - 1).as("_vote"))
      .groupBy(col("_id"))
      .agg(sum(when(col("_vote") > 0, pow(lit(2.0), col("_b"))).otherwise(lit(0.0)))
        .cast("long").as("simhash"))
      .withColumnRenamed("_id", idCol)
  }
}
