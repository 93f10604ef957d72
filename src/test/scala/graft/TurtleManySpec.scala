package graft

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path}

import org.apache.spark.sql.Row

import graft.rdf.Turtle

/** X250 — one-task-per-document Turtle reading: per-file named graphs,
  * file-scoped blank-node skolemization, full grammar (prefixes, @base,
  * lists, collections) inside each task, loud per-file errors.
  */
class TurtleManySpec extends SparkSpec {

  private def dir(docs: (String, String)*): Path = {
    val d = Files.createTempDirectory("ttlmany")
    docs.foreach { case (name, text) =>
      Files.write(d.resolve(name), text.getBytes(StandardCharsets.UTF_8))
    }
    d
  }

  private def asSet(p: Path): Set[Seq[Any]] =
    Turtle.readMany(spark, p.toString).collect()
      .toSet.map((r: Row) => r.toSeq)

  test("per-file graphs; identical anonymous bnodes in two documents " +
    "stay distinct (file-scoped labels)") {
    val d = dir(
      "a.ttl" -> """@prefix p: <urn:p/> .
                   |[] p:v "1" .""".stripMargin,
      "b.ttl" -> """@prefix p: <urn:p/> .
                   |[] p:v "2" .""".stripMargin)
    assert(asSet(d) == Set(
      Seq("a.ttl", "urn:bnode:a.ttl:b1", "urn:p/v", "1", false, null, null),
      Seq("b.ttl", "urn:bnode:b.ttl:b1", "urn:p/v", "2", false, null, null)))
  }

  test("full grammar inside each task: @base resolution, `;`/`,` " +
    "lists, lang + typed literals, bnode objects") {
    val d = dir("doc.ttl" ->
      """@prefix p: <http://ex.org/p#> .
        |@base <http://ex.org/> .
        |<x/1> p:name "jmeno"@cs , "name"@en ;
        |      p:size "4"^^<http://www.w3.org/2001/XMLSchema#integer> ;
        |      p:anon [ p:v "in" ] .""".stripMargin)
    val got = asSet(d)
    assert(got.contains(Seq("doc.ttl", "http://ex.org/x/1",
      "http://ex.org/p#name", "jmeno", false, "cs", null)))
    assert(got.contains(Seq("doc.ttl", "http://ex.org/x/1",
      "http://ex.org/p#name", "name", false, "en", null)))
    assert(got.contains(Seq("doc.ttl", "http://ex.org/x/1",
      "http://ex.org/p#size", "4", false, null,
      "http://www.w3.org/2001/XMLSchema#integer")))
    // The [ ... ] object is a fresh skolemized bnode carrying its own
    // nested triple.
    val anon = got.filter(_(2) == "http://ex.org/p#anon")
    assert(anon.size == 1)
    val bn = anon.head(3).asInstanceOf[String]
    assert(bn.startsWith("urn:bnode:doc.ttl:"))
    assert(got.contains(Seq("doc.ttl", bn, "http://ex.org/p#v", "in",
      false, null, null)))
  }

  test("Turtle sink: canonical blocks, prefix compaction only when " +
    "PN_LOCAL-safe, `a` shorthand, set-semantics object lists — and " +
    "the parser reads its own output back") {
    import org.apache.spark.sql.types._
    import org.apache.spark.sql.Row
    import scala.jdk.CollectionConverters._
    val schema = StructType(Seq(
      StructField("s", StringType), StructField("p", StringType),
      StructField("o", StringType), StructField("oIsIri", BooleanType),
      StructField("oLang", StringType), StructField("oDatatype", StringType)))
    val rdfType = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"
    val triples = spark.createDataFrame(Seq(
      Row("urn:x/1", "urn:p/name", "say \"hi\"\ttab", false, "en", null),
      Row("urn:x/1", "urn:p/name", "ahoj", false, "cs", null),
      Row("urn:x/1", rdfType, "urn:p/Thing", true, null, null),
      // duplicate triple — the `,` list must dedup (RDF set semantics)
      Row("urn:x/1", rdfType, "urn:p/Thing", true, null, null),
      // '/' in the local part: NOT PN_LOCAL-safe, stays <...>
      Row("urn:x/1", "urn:p/ref", "urn:x/sub/2", true, null, null)).asJava,
      schema)
    val (header, blocks) = Turtle.render(triples,
      Seq("p" -> "urn:p/", "x" -> "urn:x/"))
    assert(header == "@prefix p: <urn:p/> .\n@prefix x: <urn:x/> .")
    val block = blocks.collect().map(_.getString(0)).toSeq
    assert(block == Seq(
      "x:1 a p:Thing ;\n  p:name \"ahoj\"@cs , \"say \\\"hi\\\"\\ttab\"@en ;\n" +
        "  p:ref <urn:x/sub/2> ."))
    // Round trip: the driver parser reads the sink's document back to
    // the exact triple set (minus the duplicate).
    val doc = header + "\n\n" + block.mkString("\n\n")
    val back = Turtle.parseTriples(doc).map(_.toSeq).toSet
    assert(back == triples.collect().map(_.toSeq).toSet)
  }

  test("TriG sink: per-graph subject blocks with the same canonical " +
    "rules; default graph rows carry g = null") {
    import org.apache.spark.sql.types._
    import org.apache.spark.sql.Row
    import scala.jdk.CollectionConverters._
    val schema = StructType(Seq(
      StructField("g", StringType),
      StructField("s", StringType), StructField("p", StringType),
      StructField("o", StringType), StructField("oIsIri", BooleanType),
      StructField("oLang", StringType), StructField("oDatatype", StringType)))
    val quads = spark.createDataFrame(Seq(
      Row(null, "urn:x/1", "urn:p/v", "dflt", false, null, null),
      Row("urn:d/1", "urn:x/1", "urn:p/v", "b", false, null, null),
      Row("urn:d/1", "urn:x/1", "urn:p/v", "a", false, null, null),
      Row("urn:d/2", "urn:x/2", "urn:p/v", "c", false, null, null)).asJava,
      schema)
    val (header, blocks) = Turtle.renderTrig(quads, Seq("p" -> "urn:p/",
      "x" -> "urn:x/"))
    assert(header == "@prefix p: <urn:p/> .\n@prefix x: <urn:x/> .")
    val got = blocks.collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(got == Set(
      (null, "x:1 p:v \"dflt\" ."),
      ("urn:d/1", "x:1 p:v \"a\" , \"b\" ."),
      ("urn:d/2", "x:2 p:v \"c\" .")))
  }

  test("same basename in two subdirectories: distinct graphs AND " +
    "distinct bnode skolem scopes (keyed by root-relative path)") {
    val d = Files.createTempDirectory("ttlcoll")
    Files.createDirectories(d.resolve("sub1"))
    Files.createDirectories(d.resolve("sub2"))
    Files.write(d.resolve("sub1/a.ttl"),
      "[] <urn:p/v> \"1\" .".getBytes(StandardCharsets.UTF_8))
    Files.write(d.resolve("sub2/a.ttl"),
      "[] <urn:p/v> \"2\" .".getBytes(StandardCharsets.UTF_8))
    val got = Turtle.readMany(spark, s"$d/*/a.ttl").collect()
      .toSet.map((r: Row) => r.toSeq)
    assert(got == Set(
      Seq("sub1/a.ttl", "urn:bnode:sub1/a.ttl:b1", "urn:p/v", "1",
        false, null, null),
      Seq("sub2/a.ttl", "urn:bnode:sub2/a.ttl:b1", "urn:p/v", "2",
        false, null, null)))
  }

  test("a malformed document fails loudly WITH its file name") {
    val d = dir(
      "ok.ttl" -> "<urn:s/1> <urn:p/a> \"v\" .",
      "broken.ttl" -> "<urn:s/1> <urn:p/a ...garbage")
    val e = intercept[Exception] {
      Turtle.readMany(spark, d.toString).collect()
    }
    def mentions(t: Throwable): Boolean =
      t != null && (Option(t.getMessage).exists(_.contains("broken.ttl")) ||
        mentions(t.getCause))
    assert(mentions(e), s"error did not name the file: ${e.getMessage}")
  }
}
