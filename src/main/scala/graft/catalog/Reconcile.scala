package graft.catalog

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** J3: existing-resource reconciliation (the trickiest join semantics in
  * the reference, DcatAp11ToCkanBatch.java:209-251, :455-463, :504-507).
  *
  * New distributions are matched against the catalog's existing resources
  * by `distro_url` FIRST, else by `url`; matched resources keep their CKAN
  * id; existing resources that no new distribution claimed are preserved
  * and appended back into the package (preserve-unknown semantics).
  *
  * Set-based translation: two left joins + coalesce for the 2-key
  * priority; a left-anti join for the preserved remainder. Existing
  * resources are deduplicated per key (min id wins) before the join, so a
  * catalog with duplicate urls cannot fan a new distribution out into
  * multiple rows.
  *
  * KNOWN DIVERGENCE from the reference's pool-removal semantics
  * (DcatAp11ToCkanBatch.java:455-463 removes a matched id from the pool so
  * the next distribution cannot reuse it): when several NEW distributions
  * share one url, the reference assigns each a DIFFERENT pooled id
  * (first→idA, second→idB) while this set-based form gives all of them the
  * same min id and [[preserved]] re-appends the unclaimed duplicates. With
  * unique urls per catalog — the invariant CKAN itself maintains — the
  * results are identical; emulating pool removal exactly would need a
  * row_number pairing on both sides, which the duplicate-free case doesn't
  * justify.
  */
object Reconcile {

  /** Attach existing ids to new distributions.
    * `existing`: (id, url, distro_url). Adds `id` (nullable).
    */
  def attachIds(newRes: DataFrame, existing: DataFrame): DataFrame = {
    val byDistro = existing.filter(col("distro_url").isNotNull)
      .groupBy(col("distro_url")).agg(min(col("id")).as("_id_d"))
      .withColumnRenamed("distro_url", "_ed")
    val byUrl = existing.filter(col("url").isNotNull)
      .groupBy(col("url")).agg(min(col("id")).as("_id_u"))
      .withColumnRenamed("url", "_eu")
    newRes
      .join(broadcast(byDistro), col("distro_url") === col("_ed"), "left_outer")
      .join(broadcast(byUrl), col("url") === col("_eu"), "left_outer")
      .withColumn("id", coalesce(col("_id_d"), col("_id_u")))
      .drop("_ed", "_id_d", "_eu", "_id_u")
  }

  /** Existing resources claimed by no new distribution (these get appended
    * back to the package's resources array).
    */
  def preserved(newRes: DataFrame, existing: DataFrame): DataFrame = {
    val claimed = attachIds(newRes, existing)
      .select(col("id")).filter(col("id").isNotNull).distinct()
    existing.join(claimed, Seq("id"), "left_anti")
  }
}
