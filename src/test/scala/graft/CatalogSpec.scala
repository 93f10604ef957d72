package graft

import org.apache.spark.sql.functions._

import graft.catalog.CkanExtract
import graft.rdf.Turtle

/** Golden tests against the reference's OWN fixtures
  * (l-dcatAp11ToCkanBatch/src/test/resources/input.ttl + the EU file-type
  * codelist) — the closest thing to output parity the reference offers,
  * since its own integration tests are disabled (SURVEY.md §5).
  */
class CatalogSpec extends SparkSpec {
  private val fixtures =
    "/root/reference/l-dcatAp11ToCkanBatch/src/test/resources"

  private lazy val catalog = Turtle.read(spark, s"$fixtures/input.ttl")
  private lazy val codelist = Turtle.read(spark, s"$fixtures/filetypes-skos.ttl")
  private lazy val pkgs = CkanExtract.packages(catalog, Some(codelist))
    .collect().map(r => r.getAs[String]("dataset") -> r).toMap

  test("turtle parser handles the full fixtures") {
    assert(catalog.count() > 100)
    assert(codelist.count() > 2000)
    // Language tags + datatypes survive.
    assert(catalog.filter(col("oLang") === "cs").count() > 0)
    assert(catalog.filter(col("oDatatype") ===
      "http://www.w3.org/2001/XMLSchema#date").count() > 0)
    // Nested blank nodes in the codelist got distinct ids.
    assert(codelist.filter(col("s").startsWith("_:")).count() > 0)
  }

  test("dataset 1: core CKAN fields (input.ttl:22-40)") {
    val p = pkgs("http://real.dataset.iri")
    assert(p.getAs[String]("name") == "test99")
    assert(p.getAs[String]("title") == "Dataset title")
    assert(p.getAs[String]("notes") == "Dataset description")
    assert(p.getAs[String]("maintainer_email") == "opendata@cssz.cz")
    assert(p.getAs[String]("maintainer") == "Ing. Šunka")
    assert(p.getAs[String]("publisher_uri") == "https://cssz.cz")
    // foaf:name is only @cs; loadLanguage=en → absent.
    assert(p.getAs[String]("publisher_name") == null)
    assert(p.getAs[String]("nkod_link") == "http://iri.on.pvs")
    assert(p.getAs[String]("frequency") ==
      "http://publications.europa.eu/resource/authority/frequency/ANNUAL_3")
    assert(p.getAs[String]("real_issued") == "2016-07-12")
    assert(p.getAs[String]("real_modified") == "2016-07-25")
    // Trailing space per the reference's theme concat.
    assert(p.getAs[String]("theme") ==
      "http://publications.europa.eu/resource/authority/data-theme/TECH ")
    val tags = p.getSeq[org.apache.spark.sql.Row](p.fieldIndex("tags")).map(_.getString(0))
    assert(tags == Seq("data", "open"))
  }

  test("dataset 2: temporal hops, spatial, cs keywords filtered") {
    val p = pkgs("http://real.dataset.iri/2")
    assert(p.getAs[String]("name") == "test100")
    assert(p.getAs[String]("temporal_start") == "2016-07-04")
    assert(p.getAs[String]("temporal_end") == "2016-07-16")
    assert(p.getAs[String]("spatial_uri") == "http://spatialX.cz")
    // @cs keywords (data, otevřená) filtered by loadLanguage=en.
    val tags = p.getSeq[org.apache.spark.sql.Row](p.fieldIndex("tags")).map(_.getString(0))
    assert(tags == Seq("data", "open"))
  }

  test("distribution: lang-filtered fields, codelist label, URL preference, mimetype") {
    val p = pkgs("http://real.dataset.iri")
    val rs = p.getSeq[org.apache.spark.sql.Row](p.fieldIndex("resources"))
    assert(rs.size == 1)
    val r = rs.head
    assert(r.getAs[String]("name") == "English title")
    assert(r.getAs[String]("description") == "English desc")
    // downloadURL preferred over accessURL; min picks download1.
    assert(r.getAs[String]("url") == "http://download1.cz")
    assert(r.getAs[String]("distro_url") == "http://real.dataset.iri/distribution")
    assert(r.getAs[String]("created") == "2016-07-12")
    assert(r.getAs[String]("last_modified") == "2016-07-25")
    assert(r.getAs[String]("describedBy") == "http://schema1.iri")
    assert(r.getAs[String]("license_link") == "http://my.license.url")
    assert(r.getAs[String]("mimetype") == "application/trig")
    assert(r.getAs[String]("resource_type") == "file")
    // RDF_TRIG's en prefLabel from the EU codelist.
    val label = codelist.filter(col("s") ===
      "http://publications.europa.eu/resource/authority/file-type/RDF_TRIG" &&
      col("p") === "http://www.w3.org/2004/02/skos/core#prefLabel" &&
      col("oLang") === "en").select("o").collect().head.getString(0)
    assert(r.getAs[String]("format") == label)
  }

  test("JSONL sink omits null fields like the reference's isEmpty guards") {
    val line = CkanExtract.toJsonl(
      CkanExtract.packages(catalog, Some(codelist))
        .filter(col("dataset") === "http://real.dataset.iri"))
      .collect().head.getString(0)
    assert(line.contains("\"name\":\"test99\""))
    assert(line.contains("\"title\":\"Dataset title\""))
    assert(!line.contains("publisher_name")) // null → omitted
    assert(line.contains("\"tags\":[{\"name\":\"data\"},{\"name\":\"open\"}]"))
  }

  test("owner_org: ckan:organizationID overrides, organizations map is fallback") {
    import spark.implicits._
    // Without a map: dataset 2 uses its ckan:organizationID.
    assert(pkgs("http://real.dataset.iri/2").getAs[String]("owner_org") == "ooo2")
    assert(pkgs("http://real.dataset.iri").getAs[String]("owner_org") == null)
    // With a map: the declared organizationID still wins (the reference's
    // "Overriden" branch, DcatAp11ToCkanBatch.java:513-518); datasets
    // without one fall back to the map.
    val orgs = Seq(("https://cssz.cz", "cssz-org"))
      .toDF("publisher_uri", "org_name")
    val withMap = CkanExtract.packages(catalog, Some(codelist),
      organizations = Some(orgs))
      .collect().map(r => r.getAs[String]("dataset") -> r.getAs[String]("owner_org"))
      .toMap
    assert(withMap("http://real.dataset.iri") == "cssz-org")
    assert(withMap("http://real.dataset.iri/2") == "ooo2")
  }

  test("datasets without ckan:datasetID are skipped entirely") {
    import scala.jdk.CollectionConverters._
    // input.ttl triples + one extra dataset with no datasetID.
    val extra = spark.createDataFrame(Seq(
      org.apache.spark.sql.Row("http://no.id.dataset",
        "http://www.w3.org/1999/02/22-rdf-syntax-ns#type",
        "http://www.w3.org/ns/dcat#Dataset", true, null, null),
      org.apache.spark.sql.Row("http://no.id.dataset",
        "http://purl.org/dc/terms/title", "Orphan", false, "en", null)
    ).asJava, Turtle.schema)
    val out = CkanExtract.packages(catalog.unionByName(extra), Some(codelist))
      .select("dataset").collect().map(_.getString(0)).toSet
    assert(out == Set("http://real.dataset.iri", "http://real.dataset.iri/2"))
  }

  test("J3: duplicate existing urls do not fan out new distributions") {
    import spark.implicits._
    val newRes = Seq(("http://d/1", "http://u/1")).toDF("distro_url", "url")
    val existing = Seq(
      ("idA", "http://u/1", "http://d/1"),
      ("idB", "http://u/1", "http://d/1")).toDF("id", "url", "distro_url")
    val out = graft.catalog.Reconcile.attachIds(newRes, existing).collect()
    assert(out.length == 1, "duplicate-url catalog fanned out the join")
    assert(out.head.getAs[String]("id") == "idA") // min id wins
    // The duplicate the match didn't claim is preserved for re-append.
    val kept = graft.catalog.Reconcile.preserved(newRes, existing)
      .collect().map(_.getAs[String]("id")).toSeq
    assert(kept == Seq("idB"))
  }

  test("CKAN (non-NKOD) profile drops the NKOD field group (F15)") {
    val cols = CkanExtract.packages(catalog, Some(codelist),
      cfg = CkanExtract.Config(nkodProfile = false)).columns.toSet
    assert(!cols.contains("publisher_uri") && !cols.contains("theme") &&
      !cols.contains("nkod_link"))
    assert(cols.contains("title") && cols.contains("resources"))
  }
}
