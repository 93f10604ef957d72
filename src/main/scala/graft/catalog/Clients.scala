package graft.catalog

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The reference's HTTP edges (S8-S11 scans, K4-K8 sinks) behind traits so
  * the engine stays testable offline (SURVEY.md §7.4 risk 9: the
  * retry-until-responded loops aren't idempotent, so live HTTP is kept out
  * of the engine; tests use [[RecordingClient]]).
  *
  * The API contracts are inherently row-at-a-time (one POST per package /
  * node), so the drivers below iterate over collect()ed rows — catalog
  * sizes are thousands, not billions; the heavy lifting (extraction,
  * reconciliation) happened in the distributed plan upstream.
  */
trait CatalogClient {
  /** S8: organization list (uri → name). */
  def organizations(): Seq[(String, String)]
  /** S10: existence probe → existing resources (id, url, distro_url). */
  def packageShow(id: String): Option[Seq[(String, String, String)]]
  /** K4 / K5 / K6 / K8. */
  def createPackage(id: String, json: String): Either[String, Unit]
  def updatePackage(id: String, json: String): Either[String, Unit]
  def createOrganization(name: String, title: String, uri: String): Either[String, Unit]
  def deleteDataset(id: String): Either[String, Unit]
  /** K8: organization purge (x-ckanPurger CkanManager.java:83-101 —
    * datasets first, then their emptied organizations,
    * CkanPurger.java:46-47).
    */
  def deleteOrganization(id: String): Either[String, Unit]
  /** S9-style paginated listing (DKAN node.json) — drained page by page
    * until an empty page (pagesize 20, DcatAp11ToDkanBatch.java:67).
    */
  def listPage(page: Int): Seq[String]
  /** CKAN semantics: a missing dataset is created with a minimal root and
    * then ALWAYS updated with the full package
    * (DcatAp11ToCkanBatch.java:521-606). DKAN overrides to false: its
    * node POST is a plain create and a second nid-less POST would create
    * a duplicate node (DcatAp11ToDkanBatch.java:523-529 posts once).
    */
  def createThenUpdate: Boolean = true
}

/** In-memory fake that records every call — the test double for the
  * loader/purger drivers.
  */
class RecordingClient(
    var orgs: Seq[(String, String)] = Nil,
    var existing: Map[String, Seq[(String, String, String)]] = Map.empty,
    var pages: Seq[Seq[String]] = Nil,
    var failOn: Set[String] = Set.empty) extends CatalogClient {
  val calls = collection.mutable.ArrayBuffer[(String, String)]()
  /** Posted JSON bodies, for asserting the minimal-create/full-update
    * payload split: (kind, id, json).
    */
  val payloads = collection.mutable.ArrayBuffer[(String, String, String)]()
  private def record(kind: String, id: String): Either[String, Unit] = {
    calls += ((kind, id))
    if (failOn.contains(id)) Left(s"simulated failure for $id") else Right(())
  }
  def organizations(): Seq[(String, String)] = { calls += (("orgs", "")); orgs }
  def packageShow(id: String): Option[Seq[(String, String, String)]] = {
    calls += (("show", id)); existing.get(id)
  }
  def createPackage(id: String, json: String): Either[String, Unit] = {
    payloads += (("create", id, json)); record("create", id)
  }
  def updatePackage(id: String, json: String): Either[String, Unit] = {
    payloads += (("update", id, json)); record("update", id)
  }
  def createOrganization(name: String, title: String, uri: String): Either[String, Unit] = record("createOrg", name)
  def deleteDataset(id: String): Either[String, Unit] = record("delete", id)
  def deleteOrganization(id: String): Either[String, Unit] = record("deleteOrg", id)
  def listPage(page: Int): Seq[String] = {
    calls += (("page", page.toString))
    if (page < pages.size) pages(page) else Nil
  }
}

object Clients {
  /** K7: the reference's `do { … } while(!responded)` retry loop
    * (DcatAp11ToDkanBatch.java:269-294, :538-573) as a bounded helper.
    * NOT idempotent against a live API (SURVEY.md §7.4 risk 9): a POST
    * that succeeded server-side but failed to respond is re-sent — same
    * behavior as the reference, made explicit by the attempt cap.
    */
  def withRetry[A](attempts: Int)(f: => Either[String, A]): Either[String, A] = {
    var last: Either[String, A] = Left("no attempts made")
    var i = 0
    while (i < attempts && (i == 0 || last.isLeft)) {
      last = try f catch { case e: Exception => Left(e.getMessage) }
      i += 1
    }
    last
  }
}

/** K4/K5 loader driver: create-or-update each package row against the
  * catalog (DcatAp11ToCkanBatch.java:521-606 semantics: existence probe
  * decides create vs update).
  */
object CkanLoad {

  /** K6 + J2 + F3: auto-create missing publisher organizations
    * (DcatAp11ToCkanBatch.java:264-319) — the org list from the API (S8)
    * is probed by publisher_uri; missing publishers are created with the
    * NFD-slugged publisher name and the uri recorded as an extra.
    * Returns (publisher_uri → org name) including the new ones.
    */
  def ensureOrganizations(packages: DataFrame,
                          client: CatalogClient): Map[String, String] = {
    val known = client.organizations().toMap // uri → name
    val publishers = packages
      .filter(col("publisher_uri").isNotNull)
      .select(col("publisher_uri"),
        graft.functions.Scalars.nfdSlug(col("publisher_name")).as("slug"),
        col("publisher_name"))
      .distinct().collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2)))
    publishers.foldLeft(known) { case (acc, (uri, slug, name)) =>
      if (acc.contains(uri)) acc
      else client.createOrganization(slug, Option(name).getOrElse(uri), uri) match {
        case Right(_) => acc + (uri -> slug)
        // The reference fails the job on an org-create error
        // (DcatAp11ToCkanBatch.java:264-319) — packages must not reference
        // an organization that was never created.
        case Left(err) => throw new RuntimeException(
          s"organization_create failed for $uri: $err")
      }
    }
  }
  def run(packages: DataFrame, client: CatalogClient): Seq[(String, String)] = {
    // ONE collect for (name, minimal, full): separate actions on a shuffled
    // DataFrame have no consistent row order, so zipping their results
    // could pair a name with another package's payload.
    val minimalCols = Seq("name", "title", "owner_org")
      .filter(packages.columns.contains).map(col)
    val pairs = packages.select(col("name"),
      to_json(struct(minimalCols: _*)).as("_min"),
      to_json(struct(packages.columns.filter(_ != "dataset").map(col): _*))
        .as("_json"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2)))
    pairs.map { case (name, minJson, json) =>
      // Create-then-update flow (DcatAp11ToCkanBatch.java:521-606): a
      // missing dataset is first created with only {name, title,
      // owner_org}, then the FULL package is posted as package_update for
      // new and existing datasets alike — CKAN instances that reject
      // unknown fields on create accept this, a one-shot full create they
      // may not. Clients whose update is not idempotent-keyed (DKAN's
      // nid-less node POST) opt out via createThenUpdate and get one full
      // create. The existence probe is Try-wrapped so one transient
      // network error degrades to a per-package error result instead of
      // aborting the loop — and an errored probe must NOT be read as
      // "absent" (that would double-create on flaky networks).
      val outcome = scala.util.Try(client.packageShow(name)).toEither
        .left.map(e => s"probe failed: ${e.getMessage}")
        .flatMap {
          case Some(_) =>
            client.updatePackage(name, json).map(_ => false)
          case None if client.createThenUpdate =>
            client.createPackage(name, minJson)
              .flatMap(_ => client.updatePackage(name, json)).map(_ => true)
          case None =>
            client.createPackage(name, json).map(_ => true)
        }
      outcome match {
        case Left(e) => name -> s"error: $e"
        case Right(true) => name -> "created"
        case Right(false) => name -> "updated"
      }
    }.toSeq
  }
}

/** x-ckanPurger / x-dkanPurger parity: id sources + delete driver. */
object Purge {

  /** S6: single-column CSV id scan — column 0, header skipped, fixed
    * dialect (x-ckanPurger CsvReader.java:14-39); a directory input
    * unions all files (U2, CkanPurger.java:76-82).
    */
  def idsFromCsv(spark: SparkSession, path: String): DataFrame = {
    val df = spark.read.option("header", "true").csv(path)
    df.select(col(df.columns.head).as("id"))
  }

  /** S9+S11: drain a paginated listing until the first empty page
    * (DkanPurger.java:98-139 — pagination is sequential by API contract).
    */
  def idsFromPages(client: CatalogClient): Seq[String] =
    Iterator.from(0).map(client.listPage)
      .takeWhile(_.nonEmpty).flatten.toSeq

  /** K8: delete loop with the failOnError policy — failures accumulate
    * and only throw at the end when failOnError is set
    * (CkanPurger.java:103-140).
    */
  private def failCheck(results: Seq[(String, String)],
                        failOnError: Boolean): Seq[(String, String)] = {
    val failures = results.filter(_._2.startsWith("error"))
    if (failOnError && failures.nonEmpty)
      throw new RuntimeException(
        s"${failures.size} deletes failed: ${failures.take(3).map(_._1).mkString(", ")}")
    results
  }

  def purge(ids: Seq[String], client: CatalogClient,
            failOnError: Boolean): Seq[(String, String)] =
    failCheck(ids.map { id =>
      client.deleteDataset(id).fold(e => id -> s"error: $e", _ => id -> "deleted")
    }, failOnError)

  /** K8: full CKAN purge — datasets FIRST, then their (now emptied)
    * organizations (order per CkanPurger.java:46-47). Failure policy is
    * [[purge]]'s accumulate-then-throw across both phases — a DELIBERATE
    * deviation from the reference, whose failOnError aborts on the FIRST
    * failure (CkanPurger.java handleException rethrows immediately) and
    * so never reaches the organization phase; attempting every delete and
    * reporting all failures at the end is strictly more informative for a
    * bulk purge.
    */
  def purgeAll(datasetIds: Seq[String], orgIds: Seq[String],
               client: CatalogClient,
               failOnError: Boolean): Seq[(String, String)] = {
    val ds = purge(datasetIds, client, failOnError = false)
    val orgs = orgIds.map { id =>
      client.deleteOrganization(id)
        .fold(e => id -> s"error: $e", _ => id -> "org-deleted")
    }
    failCheck(ds ++ orgs, failOnError)
  }
}
