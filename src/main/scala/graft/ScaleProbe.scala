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
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def replicate(df: DataFrame, f: (DataFrame, Int) => DataFrame): DataFrame =
      (0 until replicas).map(i => f(df, i)).reduce(_ unionByName _)

    val docs = spark.read.parquet(s"$sf01/documents.parquet")
    replicate(docs, (d, i) => d.select(
      Seq((col("doc_id") + i.toLong * 10000000L).as("doc_id"),
        regexp_replace(col("text"), "(\\S+)", "$1zq" + i).as("text")) ++
        docs.columns.filterNot(Set("doc_id", "text")).map(col): _*))
      .write.mode("overwrite").parquet(s"$outDir/documents.parquet")

    val li = spark.read.parquet(s"$sf01/lineitem.parquet")
    replicate(li, (d, i) => d.withColumn("l_orderkey",
      col("l_orderkey") + i.toLong * 100000000L))
      .write.mode("overwrite").parquet(s"$outDir/lineitem.parquet")

    // Embeddings replica: per-replica SIGN-FLIP isometry (dimension j
    // negated iff bit j of a replica-specific pattern is set) — the
    // vector-space analogue of the token renaming: norms and all
    // within-replica angles are exactly preserved, while cross-replica
    // cosines decorrelate, so cluster structure scales instead of every
    // vector gaining 9 semantic duplicates.
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

    // q60 (the composed pipeline) is deliberately NOT probed: its quality
    // gate measures real token lengths and English stopwords, which no
    // content-preserving replica survives (the token renaming lengthens
    // every token → the gate empties the corpus and the "probe" times an
    // empty pipeline). Its stages are probed individually instead.
    val probes = Seq("q33_minhash_neardup", "q37_cube_observations",
      "q43_cube_full_kinds", "q51_simhash_neardup", "q55_dedup_components",
      "q61_line_dedup", "q62_kmeans", "q64_semdedup",
      "q70_simhash64_neardup")
      .filter(q => nameFilter.isEmpty || nameFilter.exists(q.contains))
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
    spark.stop()
  }
}
