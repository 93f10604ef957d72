package graft.cube

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

import graft.rdf.NTriples
import Spec._

/** End-to-end t-fdpToRdf pipeline (SURVEY.md §3.1): descriptor triples →
  * spec → CSV with dialect → observation triples → N-Triples file.
  */
object CubePipeline {

  /** CSV source with per-resource dialect (S4: Parser.java:32-65 +
    * HeaderParser defaults), all columns strings, plus `_row` = 1-based
    * file-order row number.
    *
    * W1 contract (SURVEY.md §7.4 risk 2): observation IRIs embed the row
    * number in FILE ORDER. zipWithIndex preserves it — partitions of a
    * single text file are ordered by byte offset and rows stay in order
    * within each split. The reference hard-errors on more than one CSV
    * input (FdpToRdf.java:297: "Only one CSV file expected") because with
    * several files "file order" is whatever order the scan lists them —
    * this guard enforces the same contract instead of silently
    * mis-numbering `_row` across files.
    */
  def readCsv(spark: SparkSession, path: String,
              dialect: CsvDialect = CsvDialect()): DataFrame = {
    val raw = spark.read
      .option("header", "true")
      .option("delimiter", dialect.delimiter)
      .option("quote", dialect.quote)
      .option("inferSchema", "false")
      .csv(path)
    val files = raw.inputFiles
    val shown = files.take(3).mkString(", ") +
      (if (files.length > 3) ", …" else "")
    require(files.length == 1,
      s"Only one CSV file expected (FdpToRdf.java:297): '$path' resolves to " +
        s"${files.length} files [$shown]")
    val indexed = raw.rdd.zipWithIndex.map { case (r, i) =>
      Row.fromSeq(r.toSeq :+ (i + 1L))
    }
    spark.createDataFrame(indexed, raw.schema.add("_row", LongType))
  }

  /** descriptor + CSV → triples (canonical schema). */
  def run(spark: SparkSession, descriptor: DataFrame, csvPath: String,
          resourceName: Option[String] = None,
          mode: Emitter.RoundingMode = Emitter.ExactBinary): DataFrame = {
    val spec = SpecExtraction.extract(descriptor, resourceName)
    Emitter.emit(readCsv(spark, csvPath, spec.dialect), spec, mode)
  }

  /** Triples → rendered N-Triples lines (column `value`). */
  def renderLines(triples: DataFrame): DataFrame =
    triples.select(NTriples.line(col("s"), col("p"), col("o"),
      col("oIsIri"), col("oLang"), col("oDatatype")).as("value"))

  /** S7: N-Triples passthrough (FdpToRdf.java:302-311) — `.nt` input
    * files are copied verbatim into the output alongside freshly emitted
    * lines.
    */
  def withPassthrough(spark: SparkSession, lines: DataFrame,
                      ntPaths: Seq[String]): DataFrame =
    ntPaths.foldLeft(lines) { (acc, p) =>
      acc.unionByName(spark.read.text(p))
    }

  /** K2: N-Triples text sink with the reference's CRLF + " ." line shape
    * (PlainTextTripleWriter.java:27-57). `singleFile` coalesces for
    * byte-comparable single-file output like `<packageName>.nt`; leave
    * false for distributed part files at scale.
    */
  def writeNt(triples: DataFrame, path: String,
              singleFile: Boolean = false): Unit =
    writeLines(renderLines(triples), path, singleFile)

  /** Line-level text sink (used directly when passthrough `.nt` lines are
    * unioned in). CRLF parity via lineSep.
    */
  def writeLines(lines: DataFrame, path: String,
                 singleFile: Boolean = false): Unit = {
    val out = if (singleFile) lines.coalesce(1) else lines
    out.write.option("lineSep", "\r\n").mode("overwrite").text(path)
  }
}
