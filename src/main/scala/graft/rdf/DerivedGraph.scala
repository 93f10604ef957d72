package graft.rdf

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables.t

/** A deterministic RDF graph derived from the driver's TPC-H-ish parquet
  * tables, built IDENTICALLY here and in DuckDB SQL ([[DerivedGraph.sql]])
  * so every RDF/BGP query gets a real hash-matching oracle.
  *
  * Models the reference's data shapes (SURVEY.md §1): IRIs, language-tagged
  * labels (`"otevřená"@cs`-style pairs, l-dcatAp11ToCkanBatch
  * src/test/resources/input.ttl:31,:61), datatyped literals, IRI links.
  * Schema is the canonical (s, p, o, oIsIri, oLang, oDatatype).
  *
  * Scale note: each branch is a narrow projection of one parquet scan (only
  * the 2-3 source columns are read) and the union is flat — at 100 TB this
  * is a map-only job; all subsequent BGP self-joins shuffle on `s` or `o`
  * and the tiny nation/region graphs broadcast.
  */
object DerivedGraph {
  val T = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"
  val XSD_INT = "http://www.w3.org/2001/XMLSchema#integer"
  val XSD_DEC = "http://www.w3.org/2001/XMLSchema#decimal"

  private def tr(s: org.apache.spark.sql.Column, p: String,
                 o: org.apache.spark.sql.Column, isIri: Boolean,
                 lang: String = null, dt: String = null) = {
    struct(s.as("s"), lit(p).as("p"), o.as("o"), lit(isIri).as("oIsIri"),
      (if (lang == null) lit(null) else lit(lang)).cast("string").as("oLang"),
      (if (dt == null) lit(null) else lit(dt)).cast("string").as("oDatatype"))
  }

  private def emit(df: DataFrame, triples: Seq[org.apache.spark.sql.Column]): DataFrame =
    df.select(explode(array(triples: _*)).as("t")).select("t.*")

  /** Region + nation graph (tiny — broadcast side of every BGP join). */
  def geo(spark: SparkSession, dir: String): DataFrame = {
    val r = t(spark, dir, "region")
    val n = t(spark, dir, "nation")
    val rs = concat(lit("urn:g/region/"), r("r_regionkey"))
    val ns = concat(lit("urn:g/nation/"), n("n_nationkey"))
    // The en-US / cs-CZ variants exist to exercise LANGMATCHES basic
    // filtering (RFC 4647): a "cs" range must keep cs-CZ rows, an "en"
    // range must keep en-US rows, and neither may leak across primary tags.
    emit(r, Seq(
      tr(rs, T, lit("urn:g/Region"), isIri = true),
      tr(rs, "urn:p/name", r("r_name"), isIri = false, lang = "en"),
      tr(rs, "urn:p/name", concat(r("r_name"), lit(" (us)")), isIri = false,
        lang = "en-US")
    )).unionByName(emit(n, Seq(
      tr(ns, T, lit("urn:g/Nation"), isIri = true),
      tr(ns, "urn:p/name", n("n_name"), isIri = false, lang = "en"),
      tr(ns, "urn:p/name", lower(n("n_name")), isIri = false, lang = "cs"),
      tr(ns, "urn:p/name", concat(lower(n("n_name")), lit(" (cz)")),
        isIri = false, lang = "cs-CZ"),
      tr(ns, "urn:p/inRegion",
        concat(lit("urn:g/region/"), n("n_regionkey")), isIri = true)
    )))
  }

  /** Customer graph: links into geo + typed literals + a sparse `vip`
    * property (only acctbal > 9000), for OPTIONAL / scalar-default tests.
    */
  def customers(spark: SparkSession, dir: String): DataFrame = {
    val c = t(spark, dir, "customer")
    val cs = concat(lit("urn:g/customer/"), c("c_custkey"))
    val base = emit(c, Seq(
      tr(cs, T, lit("urn:g/Customer"), isIri = true),
      tr(cs, "urn:p/name", c("c_name"), isIri = false),
      tr(cs, "urn:p/segment", c("c_mktsegment"), isIri = false, lang = "en"),
      tr(cs, "urn:p/acctbal",
        c("c_acctbal").cast(org.apache.spark.sql.types.DecimalType(12, 2))
          .cast("string"), isIri = false, dt = XSD_DEC),
      tr(cs, "urn:p/inNation",
        concat(lit("urn:g/nation/"), c("c_nationkey")), isIri = true)
    ))
    val vip = c.filter(c("c_acctbal") > 9000.0)
      .select(concat(lit("urn:g/customer/"), col("c_custkey")).as("s"),
        lit("urn:p/vip").as("p"), lit("true").as("o"),
        lit(false).as("oIsIri"), lit(null).cast("string").as("oLang"),
        lit("http://www.w3.org/2001/XMLSchema#boolean").as("oDatatype"))
    base.unionByName(vip)
  }

  /** DuckDB mirrors. Each produces the same (s,p,o,oIsIri,oLang,oDatatype)
    * rows as the Spark builders above.
    */
  object sql {
    private def row(s: String, p: String, o: String, isIri: Boolean,
                    lang: String = null, dt: String = null, from: String) = {
      val l = if (lang == null) "CAST(NULL AS VARCHAR)" else s"'$lang'"
      val d = if (dt == null) "CAST(NULL AS VARCHAR)" else s"'$dt'"
      s"SELECT $s AS s, $p AS p, $o AS o, $isIri AS oIsIri, $l AS oLang, $d AS oDatatype FROM $from"
    }

    val geo: String = Seq(
      row("'urn:g/region/' || r_regionkey", s"'$T'", "'urn:g/Region'", isIri = true, from = "region"),
      row("'urn:g/region/' || r_regionkey", "'urn:p/name'", "r_name", isIri = false, lang = "en", from = "region"),
      row("'urn:g/region/' || r_regionkey", "'urn:p/name'", "r_name || ' (us)'", isIri = false, lang = "en-US", from = "region"),
      row("'urn:g/nation/' || n_nationkey", s"'$T'", "'urn:g/Nation'", isIri = true, from = "nation"),
      row("'urn:g/nation/' || n_nationkey", "'urn:p/name'", "n_name", isIri = false, lang = "en", from = "nation"),
      row("'urn:g/nation/' || n_nationkey", "'urn:p/name'", "lower(n_name)", isIri = false, lang = "cs", from = "nation"),
      row("'urn:g/nation/' || n_nationkey", "'urn:p/name'", "lower(n_name) || ' (cz)'", isIri = false, lang = "cs-CZ", from = "nation"),
      row("'urn:g/nation/' || n_nationkey", "'urn:p/inRegion'", "'urn:g/region/' || n_regionkey", isIri = true, from = "nation")
    ).mkString("(", "\nUNION ALL\n", ")")

    val customers: String = Seq(
      row("'urn:g/customer/' || c_custkey", s"'$T'", "'urn:g/Customer'", isIri = true, from = "customer"),
      row("'urn:g/customer/' || c_custkey", "'urn:p/name'", "c_name", isIri = false, from = "customer"),
      row("'urn:g/customer/' || c_custkey", "'urn:p/segment'", "c_mktsegment", isIri = false, lang = "en", from = "customer"),
      row("'urn:g/customer/' || c_custkey", "'urn:p/acctbal'", "CAST(CAST(c_acctbal AS DECIMAL(12,2)) AS VARCHAR)", isIri = false, dt = XSD_DEC, from = "customer"),
      row("'urn:g/customer/' || c_custkey", "'urn:p/inNation'", "'urn:g/nation/' || c_nationkey", isIri = true, from = "customer"),
      row("'urn:g/customer/' || c_custkey", "'urn:p/vip'", "'true'", isIri = false,
        dt = "http://www.w3.org/2001/XMLSchema#boolean",
        from = "customer WHERE c_acctbal > 9000.0")
    ).mkString("(", "\nUNION ALL\n", ")")
  }
}
