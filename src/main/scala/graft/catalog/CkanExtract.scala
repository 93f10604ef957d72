package graft.catalog

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.Scalars

/** DCAT-AP v1.1 → CKAN package extraction (l-dcatAp11ToCkanBatch parity,
  * SURVEY.md §3.2) as ONE set-based plan.
  *
  * The reference runs ~25 scalar SPARQL lookups per dataset plus ~10 per
  * distribution inside nested loops (DcatAp11ToCkanBatch.java:194-502 —
  * the N+1 anti-pattern SURVEY.md §4.1 flags). Here every scalar lookup is
  * one conditional aggregate in a single wide groupBy over the dataset's
  * triples, distribution fields aggregate per-distribution then
  * collect_list(struct) onto the parent, and the codelist/publisher
  * lookups are broadcast joins. At 100 TB of catalog triples this is two
  * shuffles (dataset agg, distribution agg) instead of 35 queries × N
  * datasets.
  *
  * Multi-valued properties are sorted before concat/collect so output is
  * deterministic under any partitioning (the reference inherits RDF4J's
  * iteration order, which is unspecified).
  */
object CkanExtract {
  object P {
    val DCT = "http://purl.org/dc/terms/"
    val DCAT = "http://www.w3.org/ns/dcat#"
    val VCARD = "http://www.w3.org/2006/vcard/ns#"
    val FOAF = "http://xmlns.com/foaf/0.1/"
    val SKOS = "http://www.w3.org/2004/02/skos/core#"
    val CKAN = "http://linked.opendata.cz/ontology/ckan/"
    val SCHEMA = "http://schema.org/"
    val A = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"
  }

  case class Config(loadLanguage: String = "en", nkodProfile: Boolean = true)

  // RFC 4647 basic filtering (cs also matches cs-CZ) — shared with the BGP
  // engine so catalog extraction and SPARQL-subset queries agree.
  private def langMatches(lang: String): Column =
    graft.graphquery.Bgp.langMatches(col("oLang"), lang)

  /** min(when(p === prop [&& lang], o)) — the scalar-lookup inversion
    * (S2/A4): deterministic single value, null when absent (the JSON sink
    * then omits the field exactly like the reference's isEmpty() guards).
    */
  private def scalar(prop: String, lang: Option[String] = None): Column = {
    val cond = lang.foldLeft(col("p") === prop)((c, l) => c && langMatches(l))
    min(when(cond, col("o")))
  }

  /** Two-hop property path scoped to subjects (P3): (s, p1/p2 value). */
  private def path2(t: DataFrame, p1: String, p2: String,
                    lang: Option[String] = None): DataFrame = {
    val hop2Cond = lang.foldLeft(col("p") === p2)((c, l) => c && langMatches(l))
    val h1 = t.filter(col("p") === p1).select(col("s"), col("o").as("_mid"))
    val h2 = t.filter(hop2Cond).select(col("s").as("_mid"), col("o").as("_v"))
    h1.join(h2, "_mid").groupBy(col("s")).agg(min(col("_v")).as("_v"))
  }

  /** Dataset-level wide extraction. Output: one row per dcat:Dataset with
    * every CKAN field as a column (F12 renames applied).
    */
  def datasets(t: DataFrame, cfg: Config): DataFrame = {
    val lang = cfg.loadLanguage
    val ds = t.filter(col("p") === P.A && col("o") === P.DCAT + "Dataset")
      .select(col("s").as("dataset"))
    val dsT = t.join(ds, t("s") === ds("dataset")).drop("dataset")

    val wide = dsT.groupBy(col("s").as("dataset")).agg(
      scalar(P.CKAN + "datasetID").as("name"),
      scalar(P.CKAN + "organizationID").as("org_id"),
      scalar(P.DCT + "title", Some(lang)).as("title"),
      scalar(P.DCT + "description", Some(lang)).as("notes"),
      scalar(P.DCT + "issued").as("real_issued"),
      scalar(P.DCT + "modified").as("real_modified"),
      scalar(P.DCT + "accrualPeriodicity").as("frequency"),
      scalar(P.FOAF + "page").as("schema"),
      scalar(P.DCT + "spatial").as("spatial_uri"),
      scalar(P.DCT + "publisher").as("_publisher"),
      // Keywords → tags (F1+F2 applied after collect; sorted for
      // determinism, DcatAp11ToCkanBatch.java:325-332).
      sort_array(collect_list(when(col("p") === P.DCAT + "keyword" &&
        langMatches(lang), col("o")))).as("_keywords"),
      // Themes → single space-joined string WITH the reference's trailing
      // space (A2 fidelity, DcatAp11ToCkanBatch.java:396-402).
      sort_array(collect_list(when(col("p") === P.DCAT + "theme", col("o"))))
        .as("_themes"))

    def leftPath(df: DataFrame, p1: String, p2: String, as: String,
                 lang: Option[String] = None) =
      df.join(path2(t, p1, p2, lang).withColumnRenamed("_v", as)
        .withColumnRenamed("s", "_ps"),
        col("dataset") === col("_ps"), "left_outer").drop("_ps")

    var out = wide
    out = leftPath(out, P.DCAT + "contactPoint", P.VCARD + "hasEmail",
      "maintainer_email")
    out = leftPath(out, P.DCAT + "contactPoint", P.VCARD + "fn", "maintainer")
    out = leftPath(out, P.DCT + "temporal", P.SCHEMA + "startDate",
      "temporal_start")
    out = leftPath(out, P.DCT + "temporal", P.SCHEMA + "endDate", "temporal_end")

    // NKOD catalog-record link: ^foaf:primaryTopic/dct:source (P4,
    // DcatAp11ToCkanBatch.java:372).
    val nkodLink = t.filter(col("p") === P.FOAF + "primaryTopic")
      .select(col("s").as("_rec"), col("o").as("_pds"))
      .join(t.filter(col("p") === P.DCT + "source")
        .select(col("s").as("_rec"), col("o").as("nkod_link")), "_rec")
      .groupBy(col("_pds")).agg(min(col("nkod_link")).as("nkod_link"))
    out = out.join(nkodLink, col("dataset") === col("_pds"), "left_outer")
      .drop("_pds")

    // Publisher name: publisher/foaf:name@lang (J2 as broadcast join).
    // min() per subject: a multi-valued foaf:name must not fan datasets
    // out (the reference's singleResult takes one value).
    val orgNames = t.filter(col("p") === P.FOAF + "name" && langMatches(lang))
      .groupBy(col("s").as("_org"))
      .agg(min(col("o")).as("publisher_name"))
    out = out.join(broadcast(orgNames), col("_publisher") === col("_org"),
      "left_outer").drop("_org")
      .withColumnRenamed("_publisher", "publisher_uri")

    val tags = filter(transform(col("_keywords"),
      k => Scalars.fixKeyword(k)), k => length(k) >= 2)
    out
      .withColumn("tags", transform(tags, k => struct(k.as("name"))))
      .withColumn("theme", when(size(col("_themes")) > 0,
        concat(concat_ws(" ", col("_themes")), lit(" "))))
      .drop("_keywords", "_themes")
  }

  /** Distribution-level wide extraction + codelist label join (J4) +
    * URL preference/skip (F13) + NKOD mimetype (F5). One row per kept
    * distribution: (dataset, resource struct fields...).
    */
  def distributions(t: DataFrame, codelist: Option[DataFrame],
                    cfg: Config): DataFrame = {
    val lang = cfg.loadLanguage
    val link = t.filter(col("p") === P.DCAT + "distribution")
      .select(col("s").as("dataset"), col("o").as("distribution"))
    val dT = t.join(link, t("s") === link("distribution"))
      .select(link("dataset"), t("s"), t("p"), t("o"), t("oLang"))
    val wide = dT.groupBy(col("dataset"), col("s").as("distro_url")).agg(
      scalar(P.DCT + "title", Some(lang)).as("name"),
      scalar(P.DCT + "description", Some(lang)).as("description"),
      scalar(P.DCT + "format").as("_format"),
      scalar(P.DCAT + "downloadURL").as("_dwnld"),
      scalar(P.DCAT + "accessURL").as("_access"),
      scalar(P.DCT + "issued").as("created"),
      scalar(P.DCT + "modified").as("last_modified"),
      scalar(P.DCT + "conformsTo").as("describedBy"),
      scalar(P.DCT + "license").as("license_link"),
      scalar(P.DCT + "spatial").as("distro_spatial"),
      scalar(P.DCAT + "mediaType").as("_mediaType"))

    // Distribution-level temporal hops (NKOD profile,
    // DcatAp11ToCkanBatch.java:464-473).
    val withTemporal = Seq(
      ("temporal_start", P.SCHEMA + "startDate"),
      ("temporal_end", P.SCHEMA + "endDate")).foldLeft(wide) {
      case (df, (as, p2)) =>
        df.join(path2(t, P.DCT + "temporal", p2).withColumnRenamed("_v", as)
          .withColumnRenamed("s", "_ts"),
          col("distro_url") === col("_ts"), "left_outer").drop("_ts")
    }

    // Codelist label join (broadcast — the codelist graph is tiny).
    val labeled = codelist match {
      case Some(cl) =>
        // min() per concept: duplicate prefLabels must not fan
        // distributions out.
        val labels = cl.filter(col("p") === P.SKOS + "prefLabel" &&
          langMatches("en"))
          .groupBy(col("s").as("_fmt"))
          .agg(min(col("o")).as("format"))
        withTemporal.join(broadcast(labels), col("_format") === col("_fmt"),
          "left_outer").drop("_fmt")
      case None => withTemporal.withColumn("format", lit(null).cast("string"))
    }

    labeled
      // downloadURL-else-accessURL; drop the distribution when both
      // missing (F13, DcatAp11ToCkanBatch.java:434-444).
      .withColumn("url", coalesce(nullif(col("_dwnld"), lit("")),
        nullif(col("_access"), lit(""))))
      .filter(col("url").isNotNull)
      .withColumn("resource_type", lit("file"))
      .withColumn("mimetype",
        if (cfg.nkodProfile) Scalars.mimetype(col("_mediaType"))
        else lit(null).cast("string"))
      .drop("_format", "_dwnld", "_access", "_mediaType")
  }

  private val resourceFields = Seq("name", "description", "format", "url",
    "distro_url", "resource_type", "created", "last_modified",
    "temporal_start", "temporal_end", "describedBy", "license_link",
    "mimetype", "id")

  /** Full package DataFrame: dataset fields + nested resources array,
    * optionally reconciled against existing CKAN resources (J3).
    */
  def packages(t: DataFrame, codelist: Option[DataFrame] = None,
               existing: Option[DataFrame] = None,
               organizations: Option[DataFrame] = None,
               cfg: Config = Config()): DataFrame = {
    // owner_org: the dataset's ckan:organizationID OVERRIDES; the
    // API-derived organizations map (publisher_uri → org name) is the
    // fallback (DcatAp11ToCkanBatch.java:513-518 — "//Overriden" branch
    // is the organizationID).
    val ds0 = datasets(t, cfg)
    val ds = organizations match {
      case Some(orgs) => ds0
        .join(broadcast(orgs.select(col("publisher_uri"),
          col("org_name").as("_orgName"))), Seq("publisher_uri"), "left_outer")
        .withColumn("owner_org", coalesce(col("org_id"), col("_orgName")))
        .drop("_orgName", "org_id")
      case None => ds0.withColumnRenamed("org_id", "owner_org")
    }
    val distRaw = distributions(t, codelist, cfg)
    val dist = existing match {
      case Some(ex) => Reconcile.attachIds(distRaw, ex)
      case None => distRaw.withColumn("id", lit(null).cast("string"))
    }
    val resStruct = struct(resourceFields.map(col): _*)
    val res = dist
      .groupBy(col("dataset"))
      .agg(sort_array(collect_list(struct(col("distro_url").as("_k"),
        resStruct.as("r")))).as("_rs"),
        // Distro-level dct:spatial overwrites the dataset spatial_uri
        // (DcatAp11ToCkanBatch.java:474-478); max = deterministic pick.
        max(col("distro_spatial")).as("_distSpatial"))
      .withColumn("resources", transform(col("_rs"), x => x("r")))
      .drop("_rs")
    val out = ds
      // Datasets without a ckan:datasetID are skipped entirely
      // (DcatAp11ToCkanBatch.java:201-205: "has missing CKAN ID").
      .filter(col("name").isNotNull)
      .join(res, Seq("dataset"), "left_outer")
      .withColumn("spatial_uri",
        coalesce(col("_distSpatial"), col("spatial_uri")))
      .drop("_distSpatial")
    if (cfg.nkodProfile) out
    else out.drop("publisher_uri", "publisher_name", "real_issued",
      "real_modified", "nkod_link", "frequency", "temporal_start",
      "temporal_end", "schema", "spatial_uri", "theme")
  }

  /** K1: JSON-Lines sink — to_json omits null fields, matching the
    * reference's conditional put() guards.
    */
  def toJsonl(pkgs: DataFrame): DataFrame =
    pkgs.select(to_json(struct(pkgs.columns.filter(_ != "dataset")
      .map(col): _*)).as("value"))
}
