package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables.t
import graft.functions.Scalars

/** CORRECTNESS queries for the scalar library (SURVEY.md §2.7) — each
  * synthesizes deterministic inputs from the parquet tables identically in
  * Spark and DuckDB, applies the engine function, and hash-compares.
  */
object ScalarQueries {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // F1: keyword cleanup.
    "q22_fix_keyword" -> { (s, dir) =>
      val c = t(s, dir, "customer")
      c.select(col("c_custkey").as("k"),
        Scalars.fixKeyword(concat(col("c_name"), lit(",v1.2/x:y;z§w")))
          .as("fixed"))
    },

    // F7: date-shape classifier (day/month/year/datetime/invalid).
    "q23_date_classifier" -> { (s, dir) =>
      val o = t(s, dir, "orders")
      val d = date_format(col("o_orderdate"), "yyyy-MM-dd")
      val shaped = when(col("o_orderkey") % 5 === 0, d)
        .when(col("o_orderkey") % 5 === 1, substring(d, 1, 7))
        .when(col("o_orderkey") % 5 === 2, substring(d, 1, 4))
        .when(col("o_orderkey") % 5 === 3,
          date_format(col("o_orderdate"), "yyyy-MM-dd'T'HH:mm:ss"))
        .otherwise(concat(lit("bad-"), d))
      o.select(col("o_orderkey").as("k"), shaped.as("shaped"),
        Scalars.dateIri(shaped).as("date_iri"))
    },

    // F8: locale decimal parse (',' decimal sep, ' ' grouping, prefix
    // parse with trailing garbage, unparseable → null).
    "q24_decimal_parse" -> { (s, dir) =>
      graft.functions.NativeExpressions.register(s)
      val l = t(s, dir, "lineitem")
      val czech = concat(lit("1 "),
        replace(col("l_extendedprice")
          .cast(org.apache.spark.sql.types.DecimalType(12, 2)).cast("string"),
          lit("."), lit(",")))
      val raw = when(col("l_orderkey") % 10 === 0, lit("N/A"))
        .when(col("l_orderkey") % 10 === 1, concat(czech, lit(" Kč")))
        .otherwise(czech)
      l.select(col("l_orderkey").as("k"), col("l_linenumber").as("ln"),
        raw.as("raw"),
        Scalars.parseDecimal(raw, decimalSep = ",", groupSep = " ")
          .as("parsed"))
    },

    // F8+F9: parse → exact-decimal HALF_UP scale+round, with the
    // reference's raw-string fallback for unparseable values
    // (FdpMeasure.java:86-100).
    "q25_measure_round_fallback" -> { (s, dir) =>
      graft.functions.NativeExpressions.register(s)
      val l = t(s, dir, "lineitem")
      val czech = replace(col("l_extendedprice")
        .cast(org.apache.spark.sql.types.DecimalType(12, 2)).cast("string"),
        lit("."), lit(","))
      val raw = when(col("l_orderkey") % 7 === 0, lit("nine hundred"))
        .otherwise(czech)
      val parsed = Scalars.parseDecimal(raw, decimalSep = ",", groupSep = " ")
      l.select(col("l_orderkey").as("k"), col("l_linenumber").as("ln"),
        when(parsed.isNotNull,
          Scalars.measureDecimal(parsed, lit(1.055)).cast("string"))
          .otherwise(raw).as("measure"))
    },

    // F6: RÚIAN spatial-IRI parse, all 7 type branches + non-RÚIAN default.
    "q26_ruian_parse" -> { (s, dir) =>
      val n = t(s, dir, "nation")
      val typ = element_at(
        array(lit("vusc"), lit("obce"), lit("kraje"), lit("orp"),
          lit("momc"), lit("pou"), lit("stat")),
        (col("n_nationkey") % 7 + 1).cast("int"))
      val iri = when(col("n_nationkey") % 3 === 0,
        concat(lit("http://example.org/place/"), col("n_nationkey")))
        .otherwise(concat(lit("http://ruian.linked.opendata.cz/resource/"),
          typ, lit("/"), col("n_nationkey")))
      n.select(col("n_nationkey").as("k"), iri.as("spatial"),
        Scalars.ruianType(iri).as("ruian_type"),
        Scalars.ruianCode(iri).as("ruian_code"))
    },

    // F5: mimetype tail extraction; non-matching values pass through.
    "q27_mimetype" -> { (s, dir) =>
      val p = t(s, dir, "part")
      val brand = replace(lower(col("p_brand")), lit("#"), lit(""))
      val m = when(col("p_partkey") % 3 === 0,
        concat(lit("http://ex.org/fmt/application/x-"), brand))
        .when(col("p_partkey") % 3 === 1, lit("text/plain"))
        .otherwise(lit("https://w.org/m/video/mp4"))
      p.select(col("p_partkey").as("k"), m.as("media_type"),
        Scalars.mimetype(m).as("mimetype"))
    },

    // F3: NFD org-name slug (accented Latin → ASCII, space/dot → '-',
    // lowercase) via the NATIVE codegen expression (graft.functions.
    // NativeExpressions) rather than the UDF. Oracle uses DuckDB
    // strip_accents — equivalent on accented-Latin input; the
    // exotic-codepoint tail is ScalaCheck'd.
    "q28_nfd_slug" -> { (s, dir) =>
      graft.functions.NativeExpressions.register(s)
      val c = t(s, dir, "customer")
      val in = concat(lit("Úřad Vlády ČR č."), col("c_custkey"),
        lit(" "), col("c_name"))
      c.select(col("c_custkey").as("k"),
        call_function("nfd_slug", in).as("slug"))
    },

    // F4: URLEncoder-parity IRI segment encoding on a controlled alphabet.
    "q29_url_encode" -> { (s, dir) =>
      val c = t(s, dir, "customer")
      val in = concat(col("c_name"), lit(" x/y#z"))
      c.select(col("c_custkey").as("k"), Scalars.urlEncode(in).as("encoded"))
    }
  )

  val oracles: Map[String, String] = Map(
    "q22_fix_keyword" ->
      """SELECT c_custkey AS k,
        |  replace(replace(replace(replace(replace(replace(
        |    c_name || ',v1.2/x:y;z§w',
        |    ',', ''), '.', ''), '/', '-'), ':', '-'), ';', '-'),
        |    '§', 'paragraf') AS fixed
        |FROM customer""".stripMargin,
    "q23_date_classifier" ->
      """SELECT o_orderkey AS k, shaped,
        |  CASE
        |    WHEN regexp_full_match(shaped, '\d{4}-\d{2}-\d{2}')
        |      THEN 'http://reference.data.gov.uk/id/gregorian-day/' || shaped
        |    WHEN regexp_full_match(shaped, '\d{4}-\d{2}-\d{2}T\d{2}:\d{2}:\d{2}')
        |      THEN 'http://reference.data.gov.uk/id/gregorian-interval/' || shaped
        |    WHEN regexp_full_match(shaped, '\d{4}-\d{2}')
        |      THEN 'http://reference.data.gov.uk/id/gregorian-month/' || shaped
        |    WHEN regexp_full_match(shaped, '\d{4}')
        |      THEN 'http://reference.data.gov.uk/id/gregorian-year/' || shaped
        |  END AS date_iri
        |FROM (
        |  SELECT o_orderkey,
        |    CASE o_orderkey % 5
        |      WHEN 0 THEN strftime(o_orderdate, '%Y-%m-%d')
        |      WHEN 1 THEN substr(strftime(o_orderdate, '%Y-%m-%d'), 1, 7)
        |      WHEN 2 THEN substr(strftime(o_orderdate, '%Y-%m-%d'), 1, 4)
        |      WHEN 3 THEN strftime(o_orderdate, '%Y-%m-%dT%H:%M:%S')
        |      ELSE 'bad-' || strftime(o_orderdate, '%Y-%m-%d')
        |    END AS shaped
        |  FROM orders)""".stripMargin,
    "q24_decimal_parse" ->
      """SELECT l_orderkey AS k, l_linenumber AS ln, raw,
        |  CAST(nullif(regexp_extract(
        |    replace(replace(raw, ' ', ''), ',', '.'),
        |    '^(-?\d*\.?\d+|-?\d+\.?)', 1), '') AS DOUBLE) AS parsed
        |FROM (
        |  SELECT l_orderkey, l_linenumber,
        |    CASE
        |      WHEN l_orderkey % 10 = 0 THEN 'N/A'
        |      WHEN l_orderkey % 10 = 1 THEN '1 ' ||
        |        replace(CAST(CAST(l_extendedprice AS DECIMAL(12,2)) AS VARCHAR), '.', ',') || ' Kč'
        |      ELSE '1 ' ||
        |        replace(CAST(CAST(l_extendedprice AS DECIMAL(12,2)) AS VARCHAR), '.', ',')
        |    END AS raw
        |  FROM lineitem)""".stripMargin,
    "q25_measure_round_fallback" ->
      """SELECT l_orderkey AS k, l_linenumber AS ln,
        |  -- DuckDB's decimal→decimal downscale CAST truncates; round() is
        |  -- the half-up scale reduction matching Spark's decimal cast.
        |  CASE WHEN parsed IS NOT NULL
        |    THEN CAST(round(CAST(parsed AS DECIMAL(18,2)) * CAST(1.055 AS DECIMAL(10,4)), 2) AS VARCHAR)
        |    ELSE raw END AS measure
        |FROM (
        |  SELECT l_orderkey, l_linenumber, raw,
        |    CAST(nullif(regexp_extract(
        |      replace(replace(raw, ' ', ''), ',', '.'),
        |      '^(-?\d*\.?\d+|-?\d+\.?)', 1), '') AS DOUBLE) AS parsed
        |  FROM (
        |    SELECT l_orderkey, l_linenumber,
        |      CASE WHEN l_orderkey % 7 = 0 THEN 'nine hundred'
        |        ELSE replace(CAST(CAST(l_extendedprice AS DECIMAL(12,2)) AS VARCHAR), '.', ',')
        |      END AS raw
        |    FROM lineitem))""".stripMargin,
    "q26_ruian_parse" ->
      """SELECT n_nationkey AS k, spatial,
        |  CASE WHEN spatial LIKE 'http://ruian.linked.opendata.cz/resource/%'
        |    THEN CASE regexp_extract(spatial,
        |        'http://ruian\.linked\.opendata\.cz/resource/([^/]+)/(.*)', 1)
        |      WHEN 'vusc' THEN 'VC' WHEN 'obce' THEN 'OB'
        |      WHEN 'kraje' THEN 'KR' WHEN 'orp' THEN 'OP'
        |      WHEN 'momc' THEN 'MC' WHEN 'pou' THEN 'PU' ELSE 'ST' END
        |    ELSE 'ST' END AS ruian_type,
        |  CASE WHEN spatial LIKE 'http://ruian.linked.opendata.cz/resource/%'
        |    THEN regexp_extract(spatial,
        |        'http://ruian\.linked\.opendata\.cz/resource/([^/]+)/(.*)', 2)
        |    ELSE '1' END AS ruian_code
        |FROM (
        |  SELECT n_nationkey,
        |    CASE WHEN n_nationkey % 3 = 0
        |      THEN 'http://example.org/place/' || n_nationkey
        |      ELSE 'http://ruian.linked.opendata.cz/resource/' ||
        |        (['vusc','obce','kraje','orp','momc','pou','stat'])[n_nationkey % 7 + 1] ||
        |        '/' || n_nationkey
        |    END AS spatial
        |  FROM nation)""".stripMargin,
    "q27_mimetype" ->
      """SELECT p_partkey AS k, media_type,
        |  regexp_replace(media_type, '.*/([^/]+/[^/]+)', '\1') AS mimetype
        |FROM (
        |  SELECT p_partkey,
        |    CASE p_partkey % 3
        |      WHEN 0 THEN 'http://ex.org/fmt/application/x-' ||
        |        replace(lower(p_brand), '#', '')
        |      WHEN 1 THEN 'text/plain'
        |      ELSE 'https://w.org/m/video/mp4'
        |    END AS media_type
        |  FROM part)""".stripMargin,
    "q28_nfd_slug" ->
      """SELECT c_custkey AS k,
        |  lower(replace(replace(strip_accents(
        |    'Úřad Vlády ČR č.' || c_custkey || ' ' || c_name),
        |    ' ', '-'), '.', '-')) AS slug
        |FROM customer""".stripMargin,
    "q29_url_encode" ->
      """SELECT c_custkey AS k,
        |  replace(replace(replace(c_name || ' x/y#z',
        |    ' ', '-'), '/', '%2F'), '#', '%23') AS encoded
        |FROM customer""".stripMargin
  )
}
