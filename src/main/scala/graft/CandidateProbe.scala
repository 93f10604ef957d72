package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Diagnostic: candidate-pair volume per SimHash geometry — the number
  * the banded self-join must hamming-verify, i.e. the Σ C(bucket,2) term
  * the geometry choice controls. Run against a ScaleProbe replica dir to
  * see each geometry's chance-collision load at a given corpus size
  * (SCALE.md "three-decade probe" reads these beside the wall times: the
  * 64-bit form's candidates grow ~n²/2¹⁶ per band, the 128-bit form's
  * stay at true-duplicate volume).
  *
  * Usage: runMain graft.CandidateProbe <documentsDir>
  */
object CandidateProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/graft_sf100")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), col("text"))
    val n = docs.count()

    def candidates(sig: DataFrame, slices: Seq[Column]): Long =
      sig.select(posexplode(array(slices: _*)).as(Seq("_band", "_slice")))
        .groupBy(col("_band"), col("_slice"))
        .agg(count(lit(1)).as("c"))
        .agg(sum(expr("c * (c - 1) div 2"))).head().getLong(0)

    val s64 = graft.llm.Dedup.simhash64(docs, "doc_id", "text")
      .localCheckpoint(true)
    val c64 = candidates(s64, (0 until 4).map(b =>
      shiftright(col("simhash"), b * 16).bitwiseAND(lit(0xFFFFL))))
    println(s"CANDS simhash64_16bit docs=$n candidates=$c64")

    val s128 = graft.llm.Dedup.simhash128(docs, "doc_id", "text")
      .localCheckpoint(true)
    val c128 = candidates(s128, (0 until 4).map { b =>
      val src = if (b < 2) col("sim_hi") else col("sim_lo")
      shiftright(src, (b % 2) * 32).bitwiseAND(lit(0xFFFFFFFFL))
    })
    println(s"CANDS simhash128_32bit docs=$n candidates=$c128")
    spark.stop()
  }
}
