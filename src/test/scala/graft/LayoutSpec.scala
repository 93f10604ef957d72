package graft

import org.apache.spark.sql.functions._

import graft.operators.RelationalQueries.zorder16
import graft.sources.Layout

/** Size-targeted compaction gates: tiny-file consolidation, target-size
  * splitting, content preservation, and z-order-clustered layout
  * (disjoint per-file key ranges — the min/max-pruning contract).
  */
class LayoutSpec extends SparkSpec {

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  private def rm(dir: String): Unit =
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))

  private def partFiles(dir: String): Seq[java.io.File] =
    new java.io.File(dir).listFiles()
      .filter(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet"))
      .toSeq

  test("compaction consolidates a tiny-file spray into one target-sized file") {
    val orders = Tables.t(spark, sf, "orders")
    val spray = tmp("layout-spray")
    val out = tmp("layout-out")
    try {
      orders.repartition(40).write.mode("overwrite").parquet(spray)
      assert(partFiles(spray).size == 40, "fixture should be 40 tiny files")
      val sprayed = spark.read.parquet(spray)
      val bytes = Layout.inputBytes(sprayed).get
      // 40 sf0.001 files total well under 64 MB → ONE file.
      val n = Layout.writeCompacted(sprayed, out, targetMB = 64)
      assert(n == 1, s"planned $n files")
      assert(partFiles(out).size == 1)
      // Content preserved exactly.
      val got = spark.read.parquet(out)
      assert(got.count() == orders.count())
      assert(got.select(sum(col("o_orderkey"))).head.getLong(0) ==
        orders.select(sum(col("o_orderkey"))).head.getLong(0))
      // Consolidation actually helps: one file is no bigger than the
      // spray total (parquet metadata overhead per file goes away).
      assert(partFiles(out).head.length <= bytes)
    } finally { rm(spray); rm(out) }
  }

  test("compaction splits to ceil(bytes/target) files of bounded size") {
    val orders = Tables.t(spark, sf, "orders")
    val out = tmp("layout-split")
    try {
      // The byte estimate drives the plan; pin it so the split math is
      // deterministic regardless of the fixture's on-disk size.
      val n = Layout.writeCompacted(orders, out, targetMB = 1,
        bytesHint = Some((5L << 20) - 7))
      assert(n == 5, s"planned $n files")
      val files = partFiles(out)
      assert(files.size == 5, s"wrote ${files.size} files")
      // Round-robin rebalance → near-equal sizes: no file above 2× the
      // mean (the anti-skew bound).
      val sizes = files.map(_.length)
      assert(sizes.max <= 2 * (sizes.sum / sizes.size),
        s"skewed sizes $sizes")
      assert(spark.read.parquet(out).count() == orders.count())
    } finally rm(out)
  }

  test("z-order compaction yields disjoint per-file key ranges (min/max pruning)") {
    val orders = Tables.t(spark, sf, "orders")
      .select(col("o_orderkey"),
        expr("o_custkey & 65535").as("x"),
        expr("(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) " +
          "div 5000000) & 65535").as("y"))
      .withColumn("zkey", zorder16(col("x"), col("y")))
    val out = tmp("layout-zorder")
    try {
      val n = Layout.writeCompacted(orders, out, targetMB = 1,
        sortCols = Seq("zkey"), bytesHint = Some(4L << 20))
      assert(n == 4, s"planned $n files")
      val ranges = spark.read.parquet(out)
        .groupBy(input_file_name().as("f"))
        .agg(min(col("zkey")).as("lo"), max(col("zkey")).as("hi"))
        .collect().map(r => (r.getLong(1), r.getLong(2)))
        .sortBy(_._1)
      assert(ranges.length == 4)
      ranges.sliding(2).foreach {
        case Array((_, hi1), (lo2, _)) =>
          assert(lo2 >= hi1, s"overlapping file ranges: $ranges")
        case _ => ()
      }
    } finally rm(out)
  }

  test("derived (non-file-backed) plans fall back to the stats estimate") {
    import spark.implicits._
    val df = (1 to 1000).map(i => (i.toLong, "v" * 50)).toDF("k", "v")
    val out = tmp("layout-derived")
    try {
      // No inputFiles behind a local relation — must not throw, and must
      // produce at least one file with the full content.
      val n = Layout.writeCompacted(df, out, targetMB = 64)
      assert(n >= 1)
      assert(spark.read.parquet(out).count() == 1000)
    } finally rm(out)
  }
}
