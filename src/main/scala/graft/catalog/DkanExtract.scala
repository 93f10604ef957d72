package graft.catalog

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.Scalars
import CkanExtract.{Config, P}

/** DCAT-AP → DKAN (Drupal) form-field extraction (l-dcatAp11ToDkanBatch
  * parity). Reuses the CKAN wide extraction and maps to DKAN's ordered
  * name/value pairs (ArrayType(struct(name,value)) — SURVEY.md §1.1),
  * applying the NKOD mandatory-field fallbacks (F14):
  * description←title (DcatAp11ToDkanBatch.java:319-325),
  * frequency←…/frequency/UNKNOWN (:356-362), licence←unknown-licence
  * (:505-510), mimetype←octet-stream (:511-516), distro title←dataset
  * title else "Resource" (:440-445); A3 quoted-tag concat (:304-313);
  * F6 RÚIAN spatial parse with ST/1 defaults (:375-417).
  */
object DkanExtract {
  val UNKNOWN_FREQUENCY =
    "http://publications.europa.eu/resource/authority/frequency/UNKNOWN"
  val UNKNOWN_LICENCE =
    "http://joinup.ec.europa.eu/category/licence/unknown-licence"

  private def fld(name: String, value: Column): Column =
    when(value.isNotNull, struct(lit(name).as("name"), value.as("value")))

  private def fields(cols: Seq[Column]): Column =
    filter(array(cols: _*), f => f.isNotNull)

  /** Both field tables from ONE dataset-level wide aggregation: the
    * dataset agg is materialized once and shared between [[datasetFields]]
    * and [[resourceFields]] (which otherwise recomputes it just for the
    * parent-title fallback — doubling the most expensive shuffle of the
    * extraction at scale). localCheckpoint = the same barrier the
    * extraction already uses for the triple set.
    */
  def extract(t: DataFrame, groups: Option[DataFrame] = None,
              cfg: Config = Config()): (DataFrame, DataFrame) = {
    val wide = CkanExtract.datasets(t, cfg).localCheckpoint()
    (datasetFields(t, groups, cfg, precomputed = Some(wide)),
      resourceFields(t, cfg,
        datasetTitles = Some(wide.select(col("dataset"), col("title")))))
  }

  /** Dataset-level DKAN fields. `groups`: optional (publisher_uri →
    * group_id) mapping (the reference builds it from the DKAN API, J2);
    * broadcast-joined when present. `precomputed`: an already-computed
    * [[CkanExtract.datasets]] output to reuse (see [[extract]]).
    */
  def datasetFields(t: DataFrame, groups: Option[DataFrame] = None,
                    cfg: Config = Config(),
                    precomputed: Option[DataFrame] = None): DataFrame = {
    val wide0 = precomputed.getOrElse(CkanExtract.datasets(t, cfg))
    val wide = groups match {
      case Some(g) => wide0.join(
        broadcast(g.select(col("publisher_uri"), col("group_id"))),
        Seq("publisher_uri"), "left_outer")
      case None => wide0.withColumn("group_id", lit(null).cast("string"))
    }
    // A3: '""tag"" ' quoted concat over the already-fixed sorted tags.
    val quotedTags = when(size(col("tags")) > 0,
      concat_ws("", transform(col("tags"),
        x => concat(lit("\"\""), x("name"), lit("\"\" ")))))
    val nkod = Seq(
      fld("field_maintainer_email[und][0][value]", col("maintainer_email")),
      fld("field_maintainer[und][0][value]", col("maintainer")),
      fld("field_publisher_uri[und][0][value]", col("publisher_uri")),
      fld("field_publisher_name[und][0][value]", col("publisher_name")),
      fld("field_frequency_ods[und][0][value]",
        coalesce(col("frequency"), lit(UNKNOWN_FREQUENCY))),
      fld("field_temporal_start[und][0][value]", col("temporal_start")),
      fld("field_temporal_end[und][0][value]", col("temporal_end")),
      fld("field_theme[und][0][value]", col("theme")),
      fld("field_spatial[und][0][value]", col("spatial_uri")),
      fld("field_ruian_type[und][0][value]",
        when(col("spatial_uri").isNotNull, Scalars.ruianType(col("spatial_uri")))
          .otherwise(lit("ST"))),
      fld("field_ruian_code[und][0][value]",
        when(col("spatial_uri").isNotNull, Scalars.ruianCode(col("spatial_uri")))
          .otherwise(lit("1"))))
    val base = Seq(
      fld("type", lit("dataset")),
      fld("field_tags[und][value_field]", quotedTags),
      fld("title", col("title")),
      // NKOD: description mandatory — fall back to the title.
      fld("body[und][0][value]",
        if (cfg.nkodProfile) coalesce(col("notes"), col("title"))
        else col("notes")),
      fld("created", col("real_issued")),
      fld("changed", col("real_modified")),
      fld("og_group_ref[und][target_id]", col("group_id")))
    wide.select(col("dataset"),
      fields(if (cfg.nkodProfile) base ++ nkod else base).as("fields"))
  }

  /** Distribution-level DKAN resource fields. `datasetTitles`: optional
    * (dataset, title) from an already-computed dataset agg (see
    * [[extract]]) — without it the wide aggregation runs again here.
    */
  def resourceFields(t: DataFrame, cfg: Config = Config(),
                     datasetTitles: Option[DataFrame] = None): DataFrame = {
    val dist = CkanExtract.distributions(t, None, cfg)
    val dsTitle = datasetTitles.getOrElse(CkanExtract.datasets(t, cfg)
      .select(col("dataset"), col("title")))
      .select(col("dataset"), col("title").as("_dsTitle"))
    val withParent = dist
      .withColumnRenamed("mimetype", "_mime")
      .join(dsTitle, Seq("dataset"), "left_outer")
    val nkod = Seq(
      fld("field_temporal_start[und][0][value]", col("temporal_start")),
      fld("field_temporal_end[und][0][value]", col("temporal_end")),
      fld("field_described_by[und][0][value]", col("describedBy")),
      // Mandatory in NKOD/DKAN: licence + mimetype fallbacks.
      fld("field_licence[und][0][value]",
        coalesce(col("license_link"), lit(UNKNOWN_LICENCE))),
      // distributions() already tail-extracted the mimetype; the fallback
      // IRI's tail is the constant "application/octet-stream".
      fld("field_mimetype[und][0][value]",
        coalesce(col("_mime"), lit("application/octet-stream"))))
    val base = Seq(
      fld("type", lit("resource")),
      // Distribution title mandatory in DKAN: dataset title, else
      // "Resource".
      fld("title", coalesce(col("name"), col("_dsTitle"), lit("Resource"))),
      fld("body[und][0][value]", col("description")),
      fld("field_link_remote_file[und][0][filemime]", col("_mime")),
      fld("field_link_remote_file[und][0][filefield_remotefile][url]",
        col("url")),
      fld("created", col("created")),
      fld("changed", col("last_modified")))
    withParent.select(col("dataset"), col("distro_url"),
      fields(if (cfg.nkodProfile) base ++ nkod else base).as("fields"))
  }
}
