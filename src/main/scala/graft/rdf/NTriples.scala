package graft.rdf

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** N-Triples rendering of the canonical triple schema (SURVEY.md §1.2).
  *
  * Mirrors the reference's text sink
  * (t-fdpToRdf/src/main/java/com/linkedpipes/plugin/transformer/fdp/
  * PlainTextTripleWriter.java:27-57): IRIs wrapped in `<>`, literals quoted
  * with `@lang` / `^^<datatype>` suffixes, terminator `" ."` + CRLF
  * (PlainTextTripleWriter.java:38). Literal bodies get standard N-Triples
  * escaping (backslash, quote, \n, \r, \t) so output stays parseable for
  * any input text.
  *
  * Everything is built from codegen'd builtins (concat / replace / when) —
  * no UDF — so the renderer stays inside whole-stage codegen at 100 TB.
  */
object NTriples {

  /** Escape a literal body per N-Triples: \ " \n \r \t. Order matters —
    * backslash first so introduced escapes aren't re-escaped.
    */
  def escape(c: Column): Column = {
    val esc = Seq("\\" -> "\\\\", "\"" -> "\\\"", "\n" -> "\\n",
      "\r" -> "\\r", "\t" -> "\\t")
    esc.foldLeft(c) { case (acc, (from, to)) => replace(acc, lit(from), lit(to)) }
  }

  /** Render the object term: IRI, plain / lang-tagged / datatyped literal. */
  def objectTerm(o: Column, oIsIri: Column, oLang: Column, oDatatype: Column): Column =
    when(oIsIri, concat(lit("<"), o, lit(">")))
      .otherwise(concat(
        lit("\""), escape(o), lit("\""),
        when(oLang.isNotNull, concat(lit("@"), oLang))
          .when(oDatatype.isNotNull, concat(lit("^^<"), oDatatype, lit(">")))
          .otherwise(lit(""))))

  /** One N-Triples line (no trailing newline — the text sink appends it). */
  def line(s: Column, p: Column, o: Column, oIsIri: Column,
           oLang: Column, oDatatype: Column): Column =
    concat(lit("<"), s, lit("> <"), p, lit("> "),
      objectTerm(o, oIsIri, oLang, oDatatype), lit(" ."))

  /** Same line with the reference's CRLF terminator, for byte parity with
    * PlainTextTripleWriter output files.
    */
  def lineCrLf(s: Column, p: Column, o: Column, oIsIri: Column,
               oLang: Column, oDatatype: Column): Column =
    concat(line(s, p, o, oIsIri, oLang, oDatatype), lit("\r\n"))

  /** One N-Quads line (RDF 1.1 N-Quads) — the DATASET sink matching
    * [[graft.graphquery.Sparql.selectDataset]]'s input layout: the
    * triple statement with the graph label before the terminator; a
    * null `g` (default-graph row) renders as a plain N-Triples
    * statement, per the spec's optional graph slot. Same codegen'd
    * builtins as [[line]].
    */
  def quadLine(s: Column, p: Column, o: Column, oIsIri: Column,
               oLang: Column, oDatatype: Column, g: Column): Column =
    concat(lit("<"), s, lit("> <"), p, lit("> "),
      objectTerm(o, oIsIri, oLang, oDatatype),
      when(g.isNotNull, concat(lit(" <"), g, lit(">"))).otherwise(lit("")),
      lit(" ."))

  /** The `<s> <p> object` body shared by [[lineSql]] and
    * [[quadLineSql]] — ONE copy of the escape chain and object-term
    * CASE, so an escaping fix cannot drift between the two renderers.
    * Lines must not begin with `|`: callers interpolate this into
    * their own stripMargin strings, which would eat it. */
  private val tripleBodySql: String = {
    val esc = "replace(replace(replace(replace(replace(o," +
      " '\\', '\\\\')," +
      " '\"', '\\\"')," +
      " chr(10), '\\n')," +
      " chr(13), '\\r')," +
      " chr(9), '\\t')"
    s"""'<' || s || '> <' || p || '> ' ||
       |CASE WHEN oIsIri THEN '<' || o || '>'
       |     ELSE '"' || $esc || '"' ||
       |          CASE WHEN oLang IS NOT NULL THEN '@' || oLang
       |               WHEN oDatatype IS NOT NULL THEN '^^<' || oDatatype || '>'
       |               ELSE '' END
       |END""".stripMargin
  }

  /** DuckDB SQL mirror of [[line]] over columns named
    * (s, p, o, oIsIri, oLang, oDatatype) — used by oracle queries.
    */
  val lineSql: String = s"$tripleBodySql || ' .'"

  /** DuckDB SQL mirror of [[quadLine]] over (s, p, o, oIsIri, oLang,
    * oDatatype, g). */
  val quadLineSql: String = tripleBodySql +
    " ||\nCASE WHEN g IS NOT NULL THEN ' <' || g || '>' ELSE '' END || ' .'"
}
