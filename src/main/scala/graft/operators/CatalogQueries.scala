package graft.operators

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables.t
import graft.catalog.{CkanExtract, Reconcile}
import graft.catalog.CkanExtract.P

/** CORRECTNESS queries for the catalog module. q38 derives a DCAT-AP
  * graph from the TPC-H tables, runs the REAL wide-extraction path
  * (CkanExtract.packages), and flattens; the oracle computes the expected
  * result from first principles over the base tables — a stronger check
  * than mirroring the plan. q39 exercises J3 reconciliation.
  */
object CatalogQueries {

  /** DCAT-AP triples derived from customer/nation/orders. */
  private[graft] def catalogTriples(s: SparkSession, dir: String): DataFrame = {
    val c = t(s, dir, "customer").filter(col("c_custkey") % 50 === 0)
      .join(t(s, dir, "nation"), col("c_nationkey") === col("n_nationkey"))
    val ds = concat(lit("urn:cat/ds/"), col("c_custkey"))
    def tr(sC: org.apache.spark.sql.Column, p: String,
           o: org.apache.spark.sql.Column, isIri: Boolean,
           lang: String = null) =
      struct(sC.as("s"), lit(p).as("p"), o.as("o"), lit(isIri).as("oIsIri"),
        (if (lang == null) lit(null) else lit(lang)).cast("string").as("oLang"),
        lit(null).cast("string").as("oDatatype"))
    val dsTriples = c.select(explode(array(
      tr(ds, P.A, lit(P.DCAT + "Dataset"), isIri = true),
      tr(ds, P.CKAN + "datasetID", concat(lit("d"), col("c_custkey")), isIri = false),
      tr(ds, P.DCT + "title", col("c_name"), isIri = false, lang = "en"),
      tr(ds, P.DCT + "description",
        concat(lit("Desc "), col("c_mktsegment")), isIri = false, lang = "en"),
      tr(ds, P.DCT + "publisher",
        concat(lit("urn:cat/org/"), col("c_nationkey")), isIri = true),
      tr(ds, P.DCAT + "keyword", col("c_mktsegment"), isIri = false, lang = "en"),
      tr(ds, P.DCAT + "keyword", lit("x"), isIri = false, lang = "en"),
      tr(ds, P.DCAT + "keyword",
        concat(lit("k."), col("c_custkey")), isIri = false, lang = "en"),
      tr(ds, P.DCT + "accrualPeriodicity", lit("urn:freq/A"), isIri = true),
      tr(ds, P.DCAT + "theme", lit("urn:theme/T1"), isIri = true),
      tr(ds, P.DCAT + "theme", lit("urn:theme/T2"), isIri = true),
      tr(ds, P.DCAT + "contactPoint", concat(ds, lit("/cp")), isIri = true),
      tr(concat(ds, lit("/cp")), P.VCARD + "hasEmail",
        concat(lit("mailto:c"), col("c_custkey"), lit("@x.cz")), isIri = false))
    ).as("t")).select("t.*")
      // description only for %100 datasets: emitted above for all, filter.
      .filter(!(col("p") === P.DCT + "description" &&
        expr("CAST(regexp_extract(s, 'urn:cat/ds/(\\\\d+)', 1) AS BIGINT) % 100 != 0")))
    val orgTriples = t(s, dir, "nation").select(explode(array(
      tr(concat(lit("urn:cat/org/"), col("n_nationkey")), P.FOAF + "name",
        col("n_name"), isIri = false, lang = "en"))).as("t")).select("t.*")
    val o = t(s, dir, "orders")
      .filter(col("o_custkey") % 50 === 0 && col("o_orderkey") % 10 === 0)
    val dist = concat(lit("urn:cat/dist/"), col("o_orderkey"))
    val parent = concat(lit("urn:cat/ds/"), col("o_custkey"))
    val distTriples = o.select(explode(array(
      tr(parent, P.DCAT + "distribution", dist, isIri = true),
      tr(dist, P.DCT + "title",
        concat(lit("Dist "), col("o_orderkey")), isIri = false, lang = "en"),
      tr(dist, P.DCT + "format",
        concat(lit("urn:ft/"), col("o_orderkey") % 3), isIri = true),
      tr(dist, P.DCAT + "accessURL",
        concat(lit("http://acc/"), col("o_orderkey")), isIri = false),
      tr(dist, P.DCAT + "mediaType",
        lit("http://www.iana.org/assignments/media-types/text/csv"),
        isIri = false))).as("t")).select("t.*")
    val dlTriples = o.filter(col("o_orderkey") % 20 === 0)
      .select(explode(array(
        tr(dist, P.DCAT + "downloadURL",
          concat(lit("http://dl/"), col("o_orderkey")), isIri = false)))
        .as("t")).select("t.*")
    // localCheckpoint, not cache(): the extraction wide-aggregates +
    // path-joins scan the (small) triple set ~15 times, so it needs a
    // materialization barrier — but CacheManager holds cache() blocks until
    // an unpersist nobody here can sequence after the caller's action,
    // leaking across a long session. Checkpoint blocks are ContextCleaner-
    // GC'd with the DataFrame. At scale this would be a materialized
    // triples table.
    dsTriples.unionByName(orgTriples).unionByName(distTriples)
      .unionByName(dlTriples).localCheckpoint()
  }

  private def codelistTriples(s: SparkSession): DataFrame = {
    import scala.jdk.CollectionConverters._
    val rows = Seq(("urn:ft/0", "CSV"), ("urn:ft/1", "JSON"), ("urn:ft/2", "XML"))
      .map { case (iri, l) =>
        Row(iri, P.SKOS + "prefLabel", l, false, "en", null) }
    s.createDataFrame(rows.asJava, graft.rdf.Turtle.schema)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Wide DCAT→CKAN extraction (S1/S2 inversion, J2, J4, A2, A7, F1, F2,
    // F5, F12, F13), flattened for the oracle.
    "q38_ckan_packages" -> { (s, dir) =>
      val pkgs = CkanExtract.packages(catalogTriples(s, dir),
        Some(codelistTriples(s)))
      pkgs.select(col("dataset"), col("name"), col("title"), col("notes"),
        col("maintainer_email"), col("publisher_uri"), col("publisher_name"),
        col("frequency"), col("theme"),
        concat_ws(",", transform(col("tags"), x => x("name"))).as("tags_concat"),
        coalesce(size(col("resources")), lit(0)).as("n_resources"),
        when(col("resources").isNull, lit(""))
          .otherwise(concat_ws(";", transform(col("resources"),
            r => concat_ws("|", r("url"), r("format"), r("mimetype")))))
          .as("resources_concat"))
    },

    // DKAN form-field extraction (F14 fallbacks, A3 quoted tags, F6
    // RÚIAN defaults), flattened to (entity, field, value).
    "q40_dkan_fields" -> { (s, dir) =>
      // extract() shares ONE dataset wide-agg between the two field
      // tables instead of running it per table.
      val (dsF, resF) = graft.catalog.DkanExtract.extract(catalogTriples(s, dir))
      val ds = dsF
        .select(col("dataset").as("entity"), explode(col("fields")).as("f"))
      val res = resF
        .select(col("distro_url").as("entity"), explode(col("fields")).as("f"))
      ds.unionByName(res)
        .select(col("entity"), col("f.name").as("field"),
          col("f.value").as("value"))
    },

    // J3: 2-key priority reconciliation + preserve-unknown remainder.
    "q39_reconcile" -> { (s, dir) =>
      val o = t(s, dir, "orders")
      val newRes = o.select(
        concat(lit("urn:dist/"), col("o_orderkey")).as("distro_url"),
        concat(lit("http://f/"), col("o_orderkey")).as("url"))
      val existing = o.filter(col("o_orderkey") % 3 === 0).select(
        concat(lit("r"), col("o_orderkey")).as("id"),
        concat(lit("http://other/"), col("o_orderkey")).as("url"),
        concat(lit("urn:dist/"), col("o_orderkey")).as("distro_url"))
        .unionByName(o.filter(col("o_orderkey") % 3 === 1).select(
          concat(lit("u"), col("o_orderkey")).as("id"),
          concat(lit("http://f/"), col("o_orderkey")).as("url"),
          concat(lit("urn:old/"), col("o_orderkey")).as("distro_url")))
        .unionByName(o.filter(col("o_orderkey") % 10 === 0).select(
          concat(lit("x"), col("o_orderkey")).as("id"),
          concat(lit("http://gone/"), col("o_orderkey")).as("url"),
          concat(lit("urn:gone/"), col("o_orderkey")).as("distro_url")))
      val resolved = Reconcile.attachIds(newRes, existing)
        .select(col("distro_url"), col("url"), col("id"),
          lit("resolved").as("kind"))
      val kept = Reconcile.preserved(newRes, existing)
        .select(col("distro_url"), col("url"), col("id"),
          lit("preserved").as("kind"))
      resolved.unionByName(kept)
    }
  )

  val oracles: Map[String, String] = Map(
    // First-principles expected result (not a mirror of the triple plan).
    "q38_ckan_packages" ->
      """WITH rs AS (
        |  SELECT o_custkey AS k, 'urn:cat/dist/' || o_orderkey AS du,
        |    CASE WHEN o_orderkey % 20 = 0 THEN 'http://dl/' || o_orderkey
        |      ELSE 'http://acc/' || o_orderkey END AS url,
        |    CASE o_orderkey % 3 WHEN 0 THEN 'CSV' WHEN 1 THEN 'JSON'
        |      ELSE 'XML' END AS fmt
        |  FROM orders WHERE o_custkey % 50 = 0 AND o_orderkey % 10 = 0),
        |agg AS (
        |  SELECT k, count(*) AS n,
        |    string_agg(url || '|' || fmt || '|text/csv', ';' ORDER BY du) AS rc
        |  FROM rs GROUP BY k)
        |SELECT 'urn:cat/ds/' || c_custkey AS dataset,
        |  'd' || c_custkey AS name,
        |  c_name AS title,
        |  CASE WHEN c_custkey % 100 = 0 THEN 'Desc ' || c_mktsegment END AS notes,
        |  'mailto:c' || c_custkey || '@x.cz' AS maintainer_email,
        |  'urn:cat/org/' || c_nationkey AS publisher_uri,
        |  n_name AS publisher_name,
        |  'urn:freq/A' AS frequency,
        |  'urn:theme/T1 urn:theme/T2 ' AS theme,
        |  c_mktsegment || ',' || 'k' || c_custkey AS tags_concat,
        |  coalesce(n, 0) AS n_resources,
        |  coalesce(rc, '') AS resources_concat
        |FROM customer
        |JOIN nation ON c_nationkey = n_nationkey
        |LEFT JOIN agg ON agg.k = c_custkey
        |WHERE c_custkey % 50 = 0""".stripMargin,
    "q40_dkan_fields" -> {
      val dsFields = Seq(
        "'type'" -> "'dataset'",
        "'field_tags[und][value_field]'" ->
          "'\"\"' || c_mktsegment || '\"\" \"\"k' || c_custkey || '\"\" '",
        "'title'" -> "c_name",
        "'body[und][0][value]'" ->
          "CASE WHEN c_custkey % 100 = 0 THEN 'Desc ' || c_mktsegment ELSE c_name END",
        "'field_maintainer_email[und][0][value]'" ->
          "'mailto:c' || c_custkey || '@x.cz'",
        "'field_publisher_uri[und][0][value]'" ->
          "'urn:cat/org/' || c_nationkey",
        "'field_publisher_name[und][0][value]'" -> "n_name",
        "'field_frequency_ods[und][0][value]'" -> "'urn:freq/A'",
        "'field_theme[und][0][value]'" -> "'urn:theme/T1 urn:theme/T2 '",
        "'field_ruian_type[und][0][value]'" -> "'ST'",
        "'field_ruian_code[und][0][value]'" -> "'1'")
      val rsFields = Seq(
        "'type'" -> "'resource'",
        "'title'" -> "'Dist ' || o_orderkey",
        "'field_link_remote_file[und][0][filemime]'" -> "'text/csv'",
        "'field_link_remote_file[und][0][filefield_remotefile][url]'" ->
          """CASE WHEN o_orderkey % 20 = 0 THEN 'http://dl/' || o_orderkey
            |ELSE 'http://acc/' || o_orderkey END""".stripMargin,
        "'field_licence[und][0][value]'" ->
          "'http://joinup.ec.europa.eu/category/licence/unknown-licence'",
        "'field_mimetype[und][0][value]'" -> "'text/csv'")
      val dsSel = dsFields.map { case (f, v) =>
        s"""SELECT 'urn:cat/ds/' || c_custkey AS entity, $f AS field, $v AS value
           |FROM customer JOIN nation ON c_nationkey = n_nationkey
           |WHERE c_custkey % 50 = 0""".stripMargin }
      val rsSel = rsFields.map { case (f, v) =>
        s"""SELECT 'urn:cat/dist/' || o_orderkey AS entity, $f AS field, $v AS value
           |FROM orders WHERE o_custkey % 50 = 0 AND o_orderkey % 10 = 0""".stripMargin }
      (dsSel ++ rsSel).mkString("\nUNION ALL\n")
    },
    "q39_reconcile" ->
      """WITH newres AS (
        |  SELECT 'urn:dist/' || o_orderkey AS distro_url,
        |    'http://f/' || o_orderkey AS url, o_orderkey AS k
        |  FROM orders),
        |resolved AS (
        |  SELECT distro_url, url,
        |    CASE WHEN k % 3 = 0 THEN 'r' || k
        |         WHEN k % 3 = 1 THEN 'u' || k END AS id,
        |    'resolved' AS kind
        |  FROM newres)
        |SELECT * FROM resolved
        |UNION ALL
        |SELECT 'urn:gone/' || o_orderkey, 'http://gone/' || o_orderkey,
        |  'x' || o_orderkey, 'preserved'
        |FROM orders WHERE o_orderkey % 10 = 0""".stripMargin
  )
}
