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

  // ------------------------------------------------- X261 TriG source

  test("TriG grammar: every label form, default-graph bare triples and " +
    "{} blocks, optional final '.', nested bnodes inherit the graph") {
    val quads = Turtle.parseQuads(
      """@prefix p: <urn:p/> .
        |<urn:s/0> p:v "dflt" .
        |{ <urn:s/0> p:v "block" . }
        |<urn:g/1> { <urn:s/1> p:v "one" ; p:w "w" . }
        |GRAPH <urn:g/2> { <urn:s/2> p:v "two" }
        |_:g { <urn:s/3> p:v "three" . }
        |p:g4 { <urn:s/4> p:anon [ p:in "nested" ] . }
        |""".stripMargin)
      .map(r => (r.getString(0), r.getString(1), r.getString(2),
        r.getString(3))).toSet
    assert(quads.contains((null, "urn:s/0", "urn:p/v", "dflt")))
    assert(quads.contains((null, "urn:s/0", "urn:p/v", "block")))
    assert(quads.contains(("urn:g/1", "urn:s/1", "urn:p/v", "one")))
    assert(quads.contains(("urn:g/1", "urn:s/1", "urn:p/w", "w")))
    assert(quads.contains(("urn:g/2", "urn:s/2", "urn:p/v", "two")))
    assert(quads.contains(("_:g", "urn:s/3", "urn:p/v", "three")))
    // The nested bnode's own triple lands INSIDE the labeled graph.
    val nested = quads.filter(_._1 == "urn:p/g4")
    assert(nested.size == 2 &&
      nested.exists(q => q._3 == "urn:p/in" && q._4 == "nested"))
  }

  test("readManyTrig: documents' own graph labels (merged across " +
    "files), default graph = null, per-document bnode skolems") {
    val d = dir(
      "a.trig" -> """@prefix p: <urn:p/> .
                    |<urn:s/a> p:v "da" .
                    |<urn:g/shared> { <urn:s/a> p:v "ga" . }
                    |_:x { <urn:s/a> p:bn _:x . }""".stripMargin,
      "b.trig" -> """@prefix p: <urn:p/> .
                    |<urn:g/shared> { <urn:s/b> p:v "gb" . }
                    |_:x { <urn:s/b> p:bn _:x . }""".stripMargin)
    val got = Turtle.readManyTrig(spark, d.toString).collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2),
        r.getString(3))).toSet
    assert(got == Set(
      (null, "urn:s/a", "urn:p/v", "da"),
      ("urn:g/shared", "urn:s/a", "urn:p/v", "ga"),
      ("urn:g/shared", "urn:s/b", "urn:p/v", "gb"),
      // _:x skolemizes per DOCUMENT — graph labels and objects alike —
      // so the two files' [] graphs can never merge.
      ("urn:bnode:a.trig:x", "urn:s/a", "urn:p/bn", "urn:bnode:a.trig:x"),
      ("urn:bnode:b.trig:x", "urn:s/b", "urn:p/bn", "urn:bnode:b.trig:x")))
  }

  test("TriG round trip: the parser reads renderTrig's own sink output " +
    "back to the identical quad set") {
    import scala.jdk.CollectionConverters._
    val quadSchema = org.apache.spark.sql.types.StructType(
      org.apache.spark.sql.types.StructField("g",
        org.apache.spark.sql.types.StringType) +: Turtle.schema.fields)
    val original = Seq(
      Row(null, "urn:x/1", "urn:p/v", "d\"quote\nline", false, null, null),
      Row(null, "urn:x/1", "http://www.w3.org/1999/02/22-rdf-syntax-ns#type",
        "urn:t/T", true, null, null),
      Row("urn:d/1", "urn:x/1", "urn:p/v", "jmeno", false, "cs", null),
      Row("urn:d/1", "urn:x/2", "urn:p/n",
        "4", false, null, "http://www.w3.org/2001/XMLSchema#integer"),
      Row("urn:d/2", "urn:x/2", "urn:p/v", "urn:x/1", true, null, null))
    val quads = spark.createDataFrame(original.asJava, quadSchema)
    val (header, blocks) = Turtle.renderTrig(quads, Seq("p" -> "urn:p/"))
    val collected = blocks.collect()
    val sb = new StringBuilder(header + "\n")
    collected.filter(_.isNullAt(0))
      .foreach(r => sb.append(r.getString(1)).append("\n"))
    collected.filterNot(_.isNullAt(0)).groupBy(_.getString(0)).toSeq
      .sortBy(_._1).foreach { case (g, rs) =>
        sb.append(s"<$g> {\n")
        rs.foreach(r => sb.append(r.getString(1)).append("\n"))
        sb.append("}\n")
      }
    val back = Turtle.parseQuads(sb.toString)
      .map(r => (r.getString(0), r.getString(1), r.getString(2),
        r.getString(3), r.getBoolean(4), r.getString(5), r.getString(6)))
      .toSet
    assert(back == original.map(r => (r.getString(0), r.getString(1),
      r.getString(2), r.getString(3), r.getBoolean(4), r.getString(5),
      r.getString(6))).toSet)
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
