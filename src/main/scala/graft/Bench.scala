package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main (driver contract): runs every SparkEntry query against
  * SPARK_GRAFT_SF_DIR, timing a full materialization via a noop-format write
  * so Spark cannot prune the projected columns (a bare `.count()` lets the
  * scan drop every column the aggregate doesn't need, under-measuring the
  * query). Errors propagate — a broken query must fail the bench, not be
  * silently timed at -1. One warmup query absorbs session/codegen startup so
  * the first measured query isn't charged for it. Each query reports the
  * MINIMUM of three runs: this box is shared and identical code has benched
  * 1.7× apart across rounds on load spikes alone (q33: 19.4 s under a
  * round-5 load spike vs 2.2-2.9 s reproduced before and after) — min-of-N
  * is the standard noise floor for wall-clock benchmarking, and the first
  * of the three doubles as the per-query codegen warmup (a cold Janino
  * compile of the 128-slot minhash aggregate alone is ~10 s).
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val runs = sys.env.getOrElse("SPARK_GRAFT_RUNS", "3").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def run(name: String): Double = {
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }

    // Warmup: touches every table-read path + codegen once, unrecorded.
    run("q03_join_agg_regional_revenue")

    // Optional name filter (local iteration only — the driver passes no
    // args and gets the full suite).
    val names = SparkEntry.queries.keys.toSeq.sorted
      .filter(n => args.isEmpty || args.exists(n.contains))
    val results = names.map(n => n -> (1 to runs).map(_ => run(n)).min)
    // Short fixed precision keeps the whole line well under the driver's
    // 2000-char tail-capture window (full 9-decimal doubles overflowed it
    // at 59 queries, zeroing the round-7 bench record). 10 ms per-query
    // precision is far above this box's noise floor; at ~29 chars per
    // query the map fits ~66 queries per 2000 chars, so per-query times
    // use %.2f (~28 chars) to keep adding queries safe.
    def f(v: Double): String = "%.3f".formatLocal(java.util.Locale.ROOT, v)
    def fq(v: Double): String = "%.2f".formatLocal(java.util.Locale.ROOT, v)
    val qs = results.map { case (k, v) => "\"" + k + "\":" + fq(v) }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    // runs is part of the record: each value is a min-of-`runs`, and
    // cross-round comparisons are only apples-to-apples at equal runs.
    println(s"""{"metric":"total","value":${f(total)},"unit":"sec","runs":$runs,"queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
