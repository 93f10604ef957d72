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
