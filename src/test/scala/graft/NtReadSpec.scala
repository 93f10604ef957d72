package graft

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path}

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.rdf.NTriples

/** X246 — the distributed N-Triples/N-Quads SOURCE. Contract:
  * `parse ∘ render = id` on the canonical quad schema (every term
  * kind, every escape), full UCHAR decoding, skolemized blank nodes,
  * comment/blank handling, and loud-vs-salvage malformed-line modes.
  */
class NtReadSpec extends SparkSpec {

  private val quadSchema = StructType(Seq(
    StructField("g", StringType), StructField("s", StringType),
    StructField("p", StringType), StructField("o", StringType),
    StructField("oIsIri", BooleanType), StructField("oLang", StringType),
    StructField("oDatatype", StringType)))

  private def quadsDf(rows: Seq[Row]): DataFrame = {
    import scala.jdk.CollectionConverters._
    spark.createDataFrame(rows.asJava, quadSchema)
  }

  private def tmpFile(lines: Seq[String], sep: String = "\n"): Path = {
    val dir = Files.createTempDirectory("ntread")
    val f = dir.resolve("data.nq")
    Files.write(f, lines.mkString("", sep, sep).getBytes(StandardCharsets.UTF_8))
    f
  }

  private def asSet(df: DataFrame): Set[Seq[Any]] =
    df.collect().toSet.map((r: Row) => r.toSeq)

  private val xsdInt = "http://www.w3.org/2001/XMLSchema#integer"

  test("render -> parse round-trip covers every term kind and escape") {
    val quads = quadsDf(Seq(
      // default graph, IRI object
      Row(null, "urn:s/1", "urn:p/a", "urn:o/1", true, null, null),
      // named graph, plain literal with the full escape torture set
      Row("urn:g/1", "urn:s/1", "urn:p/b",
        "say \"hi\"\nback\\slash\ttab\rcr", false, null, null),
      // lang-tagged literal
      Row("urn:g/1", "urn:s/2", "urn:p/c", "ahoj", false, "cs", null),
      // typed literal
      Row("urn:g/2", "urn:s/2", "urn:p/d", "42", false, null, xsdInt),
      // empty literal
      Row(null, "urn:s/3", "urn:p/e", "", false, null, null)))
    val lines = quads.select(NTriples.quadLine(col("s"), col("p"), col("o"),
      col("oIsIri"), col("oLang"), col("oDatatype"), col("g")).as("l"))
      .collect().map(_.getString(0)).toSeq
    val back = NTriples.readQuads(spark, tmpFile(lines).toString)
    assert(asSet(back) == asSet(quads))
  }

  test("CRLF-terminated files (the reference sink's byte format) parse") {
    val lines = Seq("<urn:s/1> <urn:p/a> \"v\"@en <urn:g/1> .")
    val back = NTriples.readQuads(spark, tmpFile(lines, sep = "\r\n").toString)
    assert(asSet(back) == Set(Seq("urn:g/1", "urn:s/1", "urn:p/a", "v",
      false, "en", null)))
  }

  test("UCHAR escapes decode in literals AND inside IRIREFs") {
    val lines = Seq(
      // A = 'A'; \U0001F600 = one supplementary code point
      "<urn:s/\\u0041> <urn:p/a> \"x\\u0041y\\U0001F600z\" .",
      // literal backslash before a real u: \\u0041 stays "A" text
      "<urn:s/2> <urn:p/b> \"\\\\u0041\" .")
    val back = NTriples.readQuads(spark, tmpFile(lines).toString)
    assert(asSet(back) == Set(
      Seq(null, "urn:s/A", "urn:p/a",
        "xAy" + new String(Character.toChars(0x1F600)) + "z",
        false, null, null),
      Seq(null, "urn:s/2", "urn:p/b", "\\u0041", false, null, null)))
  }

  test("blank-node labels skolemize under the caller's prefix") {
    val lines = Seq(
      "_:b1 <urn:p/a> _:b2 .",
      "_:b1 <urn:p/name> \"n\" _:gb .")
    val back = NTriples.readQuads(spark, tmpFile(lines).toString,
      skolemPrefix = "urn:dump7:")
    assert(asSet(back) == Set(
      Seq(null, "urn:dump7:b1", "urn:p/a", "urn:dump7:b2", true, null, null),
      Seq("urn:dump7:gb", "urn:dump7:b1", "urn:p/name", "n", false, null, null)))
  }

  test("blank lines, full-line comments, and end-of-line comments") {
    val lines = Seq(
      "# a header comment",
      "",
      "   \t ",
      "<urn:s/1> <urn:p/a> <urn:o/1> . # trailing note",
      "  <urn:s/2> <urn:p/a> \"ok\" .")
    val back = NTriples.readQuads(spark, tmpFile(lines).toString)
    assert(back.count() == 2)
  }

  test("strict mode raises with the offending line; lenient drops it") {
    val lines = Seq(
      "<urn:s/1> <urn:p/a> <urn:o/1> .",
      "<urn:s/2> <urn:p/a> no-quotes-no-brackets .")
    val path = tmpFile(lines).toString
    val err = intercept[Exception] {
      NTriples.readQuads(spark, path).count()
    }
    assert(err.getMessage != null || err.getCause != null)
    val salvage = NTriples.readQuads(spark, path, strict = false)
    assert(asSet(salvage) ==
      Set(Seq(null, "urn:s/1", "urn:p/a", "urn:o/1", true, null, null)))
  }

  test("malformed escapes and unterminated terms are malformed, not garbled") {
    val bad = Seq(
      "<urn:s/1> <urn:p/a> \"bad \\q escape\" .",
      "<urn:s/1> <urn:p/a> \"unterminated .",
      "<urn:s/1> <urn:p/a \"v\" .",
      "<urn:s/1> <urn:p/a> \"v\"@ .",
      "<urn:s/1> <urn:p/a> \"v\"",
      "<urn:s/1> <urn:p/a> \"v\" <urn:g/1> <urn:x/extra> .")
    val back = NTriples.readQuads(spark, tmpFile(bad).toString, strict = false)
    assert(back.count() == 0)
  }

  test("readTriples: triple files parse; a quad statement is a violation") {
    val tri = tmpFile(Seq("<urn:s/1> <urn:p/a> \"v\"^^<" + xsdInt + "> ."))
    val got = NTriples.readTriples(spark, tri.toString)
    assert(asSet(got) == Set(Seq("urn:s/1", "urn:p/a", "v", false, null, xsdInt)))

    val quad = tmpFile(Seq("<urn:s/1> <urn:p/a> \"v\" <urn:g/1> ."))
    intercept[Exception] {
      NTriples.readTriples(spark, quad.toString).count()
    }
    assert(NTriples.readTriples(spark, quad.toString, strict = false).count() == 0)
  }

  test("minimal whitespace: a bnode label gives trailing dots back as " +
    "the terminator (W3C minimal_whitespace)") {
    val lines = Seq(
      "_:s <urn:p/a> _:o.",
      "_:s2 <urn:p/a> _:o.2.") // dots are legal INSIDE a label
    val back = NTriples.readQuads(spark, tmpFile(lines).toString)
    assert(asSet(back) == Set(
      Seq(null, "urn:bnode:s", "urn:p/a", "urn:bnode:o", true, null, null),
      Seq(null, "urn:bnode:s2", "urn:p/a", "urn:bnode:o.2", true, null, null)))
  }

  test("LANGTAG grammar is enforced structurally: trailing or empty " +
    "subtags are malformed, multi-subtag tags parse") {
    val good = Seq("<urn:s/1> <urn:p/a> \"v\"@en-Latn-x2 .")
    assert(asSet(NTriples.readQuads(spark, tmpFile(good).toString)) ==
      Set(Seq(null, "urn:s/1", "urn:p/a", "v", false, "en-Latn-x2", null)))
    val bad = Seq(
      "<urn:s/1> <urn:p/a> \"v\"@en- .",
      "<urn:s/1> <urn:p/a> \"v\"@en--us .",
      "<urn:s/1> <urn:p/a> \"v\"@7en .")
    assert(NTriples.readQuads(spark, tmpFile(bad).toString,
      strict = false).count() == 0)
  }

  test("IRIREF rejects raw spaces and control chars (no silent mis-split)") {
    val bad = Seq("<urn:s/with space> <urn:p/a> <urn:o/1> .")
    assert(NTriples.readQuads(spark, tmpFile(bad).toString,
      strict = false).count() == 0)
  }
}
