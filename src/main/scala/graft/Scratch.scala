package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.Checkpoints.CutOps

/** Throwaway profiling main (not committed): stage-times minhashNearDups
  * internals at sf0.1.
  */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sf = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    def timed[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"STAGE $label ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    for (round <- 1 to 3) {
      println(s"--- round $round")
      val docs = Tables.t(spark, sf, "documents")
      val hs = timed("hashedShingles+cache") {
        val h = graft.llm.Dedup.hashedShingles(docs, "doc_id", "text").cache()
        h.write.format("noop").mode("overwrite").save() // force
        h
      }
      val banded = timed("bandTable+ckpt") {
        graft.llm.Dedup.bandTable(hs).cutLineageEager()
      }
      val candidates = timed("candidates+ckpt") {
        banded.as("l").join(banded.as("r"),
            col("l._band") === col("r._band") &&
              col("l._bh") === col("r._bh") &&
              col("l._id") < col("r._id"))
          .select(col("l._id").as("d1"), col("r._id").as("d2"))
          .distinct().cutLineageEager()
      }
      timed("verify+ckpt") {
        val candDocs = candidates.select(col("d1").as("_id"))
          .unionByName(candidates.select(col("d2").as("_id"))).distinct()
        val hsCand = hs.join(candDocs, Seq("_id"), "left_semi")
        candidates
          .join(hsCand.select(col("_id").as("d1"), col("_x1"), col("_x2"),
            col("_sz").as("_sz1")), Seq("d1"))
          .join(hsCand.select(col("_id").as("d2"), col("_x1"), col("_x2"),
            col("_sz").as("_sz2")), Seq("d2", "_x1", "_x2"))
          .groupBy(col("d1"), col("d2")).agg(count(lit(1)).as("_ni"),
            first(col("_sz1")).as("_sz1"), first(col("_sz2")).as("_sz2"))
          .select(col("d1"), col("d2"),
            (col("_ni").cast("double") /
              (col("_sz1") + col("_sz2") - col("_ni"))).as("jaccard"))
          .filter(col("jaccard") >= 0.8)
          .cutLineageEager()
      }
      hs.unpersist(false)
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
      System.gc()
    }
    spark.stop()
  }
}
