package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.catalog.{CkanExtract, CkanLoad, DkanExtract, Purge, RecordingClient}
import graft.rdf.Turtle

class DkanSpec extends SparkSpec {
  import scala.jdk.CollectionConverters._

  private val P = CkanExtract.P

  /** Minimal graph exercising every F14 fallback: no description, no
    * accrualPeriodicity, distro without title/license/mediaType, RÚIAN
    * spatial IRI.
    */
  private def sparseCatalog = {
    def tr(s: String, p: String, o: String, lang: String = null) =
      Row(s, p, o, lang == null, lang, null)
    spark.createDataFrame(Seq(
      tr("urn:d1", P.A, P.DCAT + "Dataset"),
      tr("urn:d1", P.DCT + "title", "Only Title", "en"),
      tr("urn:d1", P.DCT + "spatial",
        "http://ruian.linked.opendata.cz/resource/obce/545880"),
      tr("urn:d1", P.DCAT + "distribution", "urn:d1/dist"),
      tr("urn:d1/dist", P.DCAT + "accessURL", "http://acc.example")
    ).asJava, Turtle.schema)
  }

  private def fieldMap(df: org.apache.spark.sql.DataFrame): Map[String, String] =
    df.select(explode(col("fields")).as("f"))
      .select(col("f.name"), col("f.value")).collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap

  test("F14: description falls back to title, frequency to UNKNOWN") {
    val f = fieldMap(DkanExtract.datasetFields(sparseCatalog))
    assert(f("body[und][0][value]") == "Only Title")
    assert(f("field_frequency_ods[und][0][value]") ==
      DkanExtract.UNKNOWN_FREQUENCY)
  }

  test("F6: RÚIAN spatial IRI parsed into type + code fields") {
    val f = fieldMap(DkanExtract.datasetFields(sparseCatalog))
    assert(f("field_spatial[und][0][value]") ==
      "http://ruian.linked.opendata.cz/resource/obce/545880")
    assert(f("field_ruian_type[und][0][value]") == "OB")
    assert(f("field_ruian_code[und][0][value]") == "545880")
  }

  test("F14: distro title falls back to dataset title; licence + mimetype mandatory") {
    val f = fieldMap(DkanExtract.resourceFields(sparseCatalog))
    assert(f("title") == "Only Title")
    assert(f("field_licence[und][0][value]") == DkanExtract.UNKNOWN_LICENCE)
    assert(f("field_mimetype[und][0][value]") == "application/octet-stream")
    assert(f("field_link_remote_file[und][0][filefield_remotefile][url]") ==
      "http://acc.example")
  }

  test("A3: quoted-tag concat shape over the reference fixture") {
    val catalog = Turtle.read(spark,
      "/root/reference/l-dcatAp11ToCkanBatch/src/test/resources/input.ttl")
    val fields = DkanExtract.datasetFields(catalog)
      .filter(col("dataset") === "http://real.dataset.iri")
    val f = fieldMap(fields)
    // DcatAp11ToDkanBatch.java:304-313: ""tag"" with trailing space each.
    assert(f("field_tags[und][value_field]") == "\"\"data\"\" \"\"open\"\" ")
  }

  test("loader driver: create-or-update via existence probe") {
    val catalog = Turtle.read(spark,
      "/root/reference/l-dcatAp11ToCkanBatch/src/test/resources/input.ttl")
    val pkgs = CkanExtract.packages(catalog)
    val client = new RecordingClient(
      existing = Map("test99" -> Seq(("r1", "http://u", "http://d"))))
    val results = CkanLoad.run(pkgs, client).toMap
    assert(results("test99") == "updated")
    assert(results("test100") == "created")
    // Create-then-update (DcatAp11ToCkanBatch.java:521-606): the existing
    // dataset gets only an update; the new one is created with the minimal
    // {name,title,owner_org} root and then updated with the full package.
    assert(client.calls.count(_._1 == "create") == 1)
    assert(client.calls.count(_._1 == "update") == 2)
    val createSeq = client.calls.filter(c => c._1 == "create" || c._1 == "update")
      .collect { case (k, "test100") => k }
    assert(createSeq == Seq("create", "update"))
    val createJson = client.payloads.collectFirst {
      case ("create", "test100", j) => j
    }.get
    val keys = graft.catalog.Http.mapper.readTree(createJson).fieldNames()
    import scala.jdk.CollectionConverters._
    assert(keys.asScala.toSet.subsetOf(Set("name", "title", "owner_org")))
    val updateJson = client.payloads.collectFirst {
      case ("update", "test100", j) => j
    }.get
    assert(updateJson.length > createJson.length)
  }

  test("loader driver: DKAN-style clients get ONE full create, no update") {
    // createThenUpdate=false (DkanHttpClient semantics: a second nid-less
    // node POST would create a duplicate node) — the loader must post the
    // full package exactly once for a new dataset.
    val catalog = Turtle.read(spark,
      "/root/reference/l-dcatAp11ToCkanBatch/src/test/resources/input.ttl")
    val pkgs = CkanExtract.packages(catalog)
    val client = new RecordingClient() { override def createThenUpdate = false }
    val results = CkanLoad.run(pkgs, client).toMap
    assert(results.values.forall(_ == "created"))
    assert(client.calls.count(_._1 == "update") == 0)
    assert(client.calls.count(_._1 == "create") == 2)
    // And the single create carries the FULL package, not the minimal root.
    val json = client.payloads.collectFirst { case ("create", "test99", j) => j }.get
    import scala.jdk.CollectionConverters._
    assert(graft.catalog.Http.mapper.readTree(json)
      .fieldNames().asScala.size > 3)
  }

  test("purge driver: datasets before organizations, combined failOnError") {
    val client = new RecordingClient()
    val out = Purge.purgeAll(Seq("d1", "d2"), Seq("o1"), client,
      failOnError = false).toMap
    assert(out == Map("d1" -> "deleted", "d2" -> "deleted",
      "o1" -> "org-deleted"))
    // Datasets are purged before their organizations (CkanPurger.java:46-47).
    val order = client.calls.collect {
      case ("delete", id) => id
      case ("deleteOrg", id) => id
    }
    assert(order == Seq("d1", "d2", "o1"))
    // failOnError accumulates across BOTH phases and throws at the end.
    val failing = new RecordingClient(failOn = Set("d1", "o1"))
    val ex = intercept[RuntimeException] {
      Purge.purgeAll(Seq("d1", "d2"), Seq("o1"), failing, failOnError = true)
    }
    assert(ex.getMessage.contains("2 deletes failed"))
    assert(failing.calls.count(_._1 == "deleteOrg") == 1) // o1 still attempted
  }

  test("purge driver: paginated listing + failOnError accumulation") {
    val client = new RecordingClient(
      pages = Seq(Seq("a", "b"), Seq("c"), Nil),
      failOn = Set("b"))
    val ids = Purge.idsFromPages(client)
    assert(ids == Seq("a", "b", "c"))
    // failOnError=false: all attempted, failure recorded.
    val report = Purge.purge(ids, client, failOnError = false)
    assert(report.count(_._2 == "deleted") == 2)
    assert(report.exists { case (id, r) => id == "b" && r.startsWith("error") })
    // failOnError=true: throws AFTER attempting everything.
    val before = client.calls.size
    val ex = intercept[RuntimeException](
      Purge.purge(ids, client, failOnError = true))
    assert(ex.getMessage.contains("1 deletes failed"))
    assert(client.calls.size == before + 3)
  }

  test("K6: missing publisher orgs are auto-created with NFD-slugged names") {
    val catalog = Turtle.read(spark,
      "/root/reference/l-dcatAp11ToCkanBatch/src/test/resources/input.ttl")
    // loadLanguage=cs so publisher_name resolves ("ČSSZ"@cs).
    val pkgs = CkanExtract.packages(catalog,
      cfg = CkanExtract.Config(loadLanguage = "cs"))
    val client = new RecordingClient(orgs = Seq())
    val orgs = CkanLoad.ensureOrganizations(pkgs, client)
    // NFD slug of "ČSSZ" → "cssz" (DcatAp11ToCkanBatch.java:273-277).
    assert(orgs == Map("https://cssz.cz" -> "cssz"))
    assert(client.calls.contains(("createOrg", "cssz")))
    // Known orgs are not re-created.
    val client2 = new RecordingClient(orgs = Seq("https://cssz.cz" -> "existing"))
    CkanLoad.ensureOrganizations(pkgs, client2)
    assert(!client2.calls.exists(_._1 == "createOrg"))
  }

  test("K7: retry-until-responded loop retries failures, stops on success") {
    var calls = 0
    val out = graft.catalog.Clients.withRetry(5) {
      calls += 1
      if (calls < 3) Left("no response") else Right("nid-42")
    }
    assert(out == Right("nid-42") && calls == 3)
    // Bounded: persistent failure gives the last error after max attempts.
    var calls2 = 0
    val fail = graft.catalog.Clients.withRetry(4) {
      calls2 += 1; Left(s"down $calls2"): Either[String, String]
    }
    assert(fail == Left("down 4") && calls2 == 4)
  }

  test("S6: CSV id-list source reads column 0 across a directory (U2)") {
    val dir = java.nio.file.Files.createTempDirectory("graft-purge").toFile
    java.nio.file.Files.writeString(
      new java.io.File(dir, "a.csv").toPath, "id,extra\nd1,x\nd2,y\n")
    java.nio.file.Files.writeString(
      new java.io.File(dir, "b.csv").toPath, "id,extra\nd3,z\n")
    val ids = Purge.idsFromCsv(spark, dir.getPath)
      .collect().map(_.getString(0)).sorted
    assert(ids.toSeq == Seq("d1", "d2", "d3"))
  }
}
