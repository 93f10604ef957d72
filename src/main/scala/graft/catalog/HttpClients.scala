package graft.catalog

import java.net.URI
import java.net.URLEncoder
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.charset.StandardCharsets.UTF_8
import java.time.Duration

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}

import scala.jdk.CollectionConverters._
import scala.util.Try

/** Live [[CatalogClient]] implementations over `java.net.http` — the
  * production counterparts of [[RecordingClient]], kept OUT of every query
  * path (the distributed plans never touch HTTP; these run driver-side over
  * already-extracted rows, exactly like the reference's loaders).
  *
  * Endpoint shapes follow the reference verbatim:
  *  - CKAN Action API: organization_list + organization_show
  *    (DcatAp11ToCkanBatch.java:84-154), package_show (:213-251),
  *    package_create / package_update with the api key in the
  *    Authorization header (:521-606), organization_create with the uri
  *    extra (:264-319), dataset_purge with a {"id": …} body
  *    (x-ckanPurger CkanManager.java:59-71), package_list
  *    (CkanManager.java:40-47).
  *  - DKAN: form-encoded user/login returning {"token"}
  *    (DcatAp11ToDkanBatch.java:156-197 — the S11 edge), node listing
  *    via /node?pagesize=20&page=N (DkanPurger.java:100-138), node POST
  *    and DELETE with the X-CSRF-Token header (DcatAp11ToDkanBatch.java:523,
  *    DkanPurger.java:141-146).
  */
object Http {
  val mapper = new ObjectMapper()

  /** Per-request (read) timeout: the connect timeout alone cannot cover a
    * server that accepts the connection and then stalls, which would hang
    * the driver-side load/purge loop indefinitely. Overridable per call.
    */
  val DefaultRequestTimeout: Duration = Duration.ofSeconds(60)

  def defaultClient(): HttpClient = HttpClient.newBuilder()
    .followRedirects(HttpClient.Redirect.NORMAL) // LaxRedirectStrategy parity
    .connectTimeout(Duration.ofSeconds(30))
    .build()

  private[catalog] def enc(s: String): String = URLEncoder.encode(s, UTF_8)

  private[catalog] def get(client: HttpClient, uri: String,
                           headers: Seq[(String, String)] = Nil,
                           timeout: Duration = DefaultRequestTimeout): (Int, String) =
    send(client, withHeaders(HttpRequest.newBuilder(URI.create(uri))
      .timeout(timeout).GET(), headers))

  private[catalog] def post(client: HttpClient, uri: String, body: String,
                            headers: Seq[(String, String)],
                            timeout: Duration = DefaultRequestTimeout): (Int, String) =
    send(client, withHeaders(HttpRequest.newBuilder(URI.create(uri)).timeout(timeout)
      .POST(HttpRequest.BodyPublishers.ofString(body, UTF_8)), headers))

  private[catalog] def delete(client: HttpClient, uri: String,
                              headers: Seq[(String, String)],
                              timeout: Duration = DefaultRequestTimeout): (Int, String) =
    send(client, withHeaders(HttpRequest.newBuilder(URI.create(uri))
      .timeout(timeout).DELETE(), headers))

  private def withHeaders(b: HttpRequest.Builder,
                          headers: Seq[(String, String)]): HttpRequest =
    headers.foldLeft(b)((acc, h) => acc.header(h._1, h._2)).build()

  private def send(client: HttpClient, req: HttpRequest): (Int, String) = {
    val resp = client.send(req, HttpResponse.BodyHandlers.ofString())
    (resp.statusCode(), resp.body())
  }

  /** application/x-www-form-urlencoded body (UrlEncodedFormEntity parity). */
  private[catalog] def formBody(fields: (String, String)*): String =
    fields.map { case (k, v) => s"${enc(k)}=${enc(v)}" }.mkString("&")
}

/** CKAN Action API client. `apiUri` is the action root, e.g.
  * `http://ckan.example/api/3/action`; `apiKey` goes in the Authorization
  * header of every mutating call (the reference sends no auth on reads).
  */
class CkanHttpClient(apiUri: String, apiKey: String,
                     client: HttpClient = Http.defaultClient())
    extends CatalogClient {
  import Http._

  private def auth = Seq("Authorization" -> apiKey)

  /** S8: organization_list, then organization_show per org; an org maps
    * uri → name through its `uri` extra (DcatAp11ToCkanBatch.java:119-135).
    * Orgs without the extra (or failing to download) are skipped, like the
    * reference's log-and-continue.
    */
  def organizations(): Seq[(String, String)] = {
    val (code, body) = get(client, s"$apiUri/organization_list")
    if (code != 200) return Nil
    val names = mapper.readTree(body).path("result").elements().asScala
      .map(_.asText()).toSeq
    names.flatMap { name =>
      // Try wraps the WHOLE per-org block — transport failures AND a
      // malformed body on a 200 both skip the org; the reference's per-org
      // catch covers parse errors too (:140-142), and one broken org must
      // not abort the loop.
      Try {
        val (c, b) = get(client, s"$apiUri/organization_show?id=${enc(name)}")
        if (c != 200) None
        else mapper.readTree(b).path("result").path("extras").elements().asScala
          .find(_.path("key").asText() == "uri")
          .map(e => e.path("value").asText() -> name)
      }.toOption.flatten
    }
  }

  /** S10: package_show existence probe; 200 yields the existing resources
    * as (id, url, distro_url) for reconciliation (J3), any other status is
    * "not found" (DcatAp11ToCkanBatch.java:213-251).
    */
  def packageShow(id: String): Option[Seq[(String, String, String)]] = {
    val (code, body) = get(client, s"$apiUri/package_show?id=${enc(id)}")
    if (code != 200) None
    else Some(mapper.readTree(body).path("result").path("resources")
      .elements().asScala.map { r =>
        (r.path("id").asText(""), r.path("url").asText(""),
          r.path("distro_url").asText(""))
      }.toSeq)
  }

  private def postJson(endpoint: String, json: String): Either[String, Unit] =
    Try(post(client, s"$apiUri/$endpoint", json, auth)).toEither
      .left.map(_.getMessage).flatMap {
        case (200, _) => Right(())
        // The reference treats 409 as a distinct, fatal condition on both
        // package_create and organization_create (:544-548, :298-302).
        case (409, b) => Left(s"conflict (409): $b")
        case (c, b) => Left(s"HTTP $c: $b")
      }

  /** K4: package_create?id=… with the full JSON body
    * (DcatAp11ToCkanBatch.java:529-538).
    */
  def createPackage(id: String, json: String): Either[String, Unit] =
    postJson(s"package_create?id=${enc(id)}", json)

  /** K5: package_update?id=… (DcatAp11ToCkanBatch.java:576-585). */
  def updatePackage(id: String, json: String): Either[String, Unit] =
    postJson(s"package_update?id=${enc(id)}", json)

  /** K6: organization_create with {name, title, extras:[{key:uri}]}
    * (DcatAp11ToCkanBatch.java:266-288).
    */
  def createOrganization(name: String, title: String,
                         uri: String): Either[String, Unit] = {
    val root = mapper.createObjectNode()
    root.put("name", name)
    root.put("title", title)
    root.putArray("extras").addObject().put("key", "uri").put("value", uri)
    postJson("organization_create", mapper.writeValueAsString(root))
  }

  /** K8: dataset_purge with {"id": …} (x-ckanPurger CkanManager.java:59-71). */
  def deleteDataset(id: String): Either[String, Unit] =
    purgeById("dataset_purge", id)

  /** K8: organization_purge with {"id": …} (CkanManager.java:83-101). */
  def deleteOrganization(id: String): Either[String, Unit] =
    purgeById("organization_purge", id)

  private def purgeById(endpoint: String, id: String): Either[String, Unit] = {
    val root = mapper.createObjectNode()
    root.put("id", id)
    postJson(endpoint, mapper.writeValueAsString(root))
  }

  /** CKAN has no paginated node listing — package_list returns every
    * dataset name at once (CkanManager.java:40-47), exposed as single-page.
    */
  def listPage(page: Int): Seq[String] =
    if (page > 0) Nil
    else {
      val (code, body) = get(client, s"$apiUri/package_list")
      if (code != 200) Nil
      else mapper.readTree(body).path("result").elements().asScala
        .map(_.asText()).toSeq
    }
}

/** DKAN client. Lazily logs in via the form-encoded user/login endpoint
  * (S11 — DcatAp11ToDkanBatch.java:156-197) and sends the returned token
  * as X-CSRF-Token on every mutating call.
  */
class DkanHttpClient(apiUri: String, username: String, password: String,
                     client: HttpClient = Http.defaultClient(),
                     pageSize: Int = 20)
    extends CatalogClient {
  import Http._

  /** S11: one login per client lifetime, like the reference's single
    * getToken at execute() start (DcatAp11ToDkanBatch.java:215).
    */
  private lazy val token: String = {
    val (code, body) = post(client, s"$apiUri/user/login",
      formBody("username" -> username, "password" -> password),
      Seq("Accept" -> "application/json",
        "Content-Type" -> "application/x-www-form-urlencoded"))
    if (code != 200) throw new RuntimeException(s"login failed: HTTP $code: $body")
    mapper.readTree(body).path("token").asText()
  }

  private def csrf = Seq("X-CSRF-Token" -> token)

  /** S8 (DKAN): group nodes page through node.json?parameters[type]=group;
    * each group's detail page carries its uri field
    * (DcatAp11ToDkanBatch.java:87-152). Groups without a uri are skipped.
    */
  def organizations(): Seq[(String, String)] = {
    val groups = drainPages(p =>
      s"$apiUri/node.json?parameters%5Btype%5D=group&pagesize=$pageSize&page=$p",
      n => n.path("nid").asText(""))
    groups.flatMap { nid =>
      // Log-and-continue parity covers thrown I/O errors AND malformed
      // bodies — the parse sits inside the Try.
      Try {
        val (c, b) = get(client, s"$apiUri/node/$nid.json")
        if (c != 200) None
        else {
          val uri = mapper.readTree(b).path("field_uri").path("und").path(0)
            .path("url").asText("")
          if (uri.isEmpty) None else Some(uri -> nid)
        }
      }.toOption.flatten
    }
  }

  /** S10 (DKAN): dataset existence is probed through the node listing
    * filtered by title — DKAN has no package_show; the loader matches on
    * the dataset's node uri (DcatAp11ToDkanBatch.java:318-356). Reads the
    * node detail and returns its resource nodes when present.
    */
  def packageShow(id: String): Option[Seq[(String, String, String)]] = {
    val (c, b) = get(client, s"$apiUri/node/$id.json")
    if (c != 200) None
    else Some(mapper.readTree(b).path("field_resources").path("und")
      .elements().asScala.map { r =>
        val nid = r.path("target_id").asText("")
        (nid, "", "")
      }.toSeq)
  }

  /** K7: node create — POST /node with X-CSRF-Token
    * (DcatAp11ToDkanBatch.java:523-529).
    */
  def createPackage(id: String, json: String): Either[String, Unit] =
    postNode(json)

  /** DKAN updates also POST /node (the payload carries the nid)
    * (DcatAp11ToDkanBatch.java:579-585).
    */
  def updatePackage(id: String, json: String): Either[String, Unit] =
    postNode(json)

  private def postNode(json: String): Either[String, Unit] = {
    // Token fetch OUTSIDE the Try: a failed login must abort the whole
    // load (the reference throws from getToken, DcatAp11ToDkanBatch.java
    // :180-182), not degrade into a per-package error.
    val headers = csrf ++ Seq("Content-Type" -> "application/json",
      "Accept" -> "application/json")
    Try(post(client, s"$apiUri/node", json, headers)).toEither
      .left.map(_.getMessage).flatMap {
        case (c, _) if c == 200 || c == 201 => Right(())
        case (c, b) => Left(s"HTTP $c: $b")
      }
  }

  /** DKAN's node POST is a bare create (no id in the payload): a second
    * nid-less POST would create a duplicate node, so the loader must post
    * the full package exactly once (DcatAp11ToDkanBatch.java:523-529).
    */
  override def createThenUpdate: Boolean = false

  /** Group create — POST /node with type group and the publisher uri as
    * field_uri (DcatAp11ToDkanBatch.java:250-258), the same field
    * [[organizations]] reads back to map uri → group.
    */
  def createOrganization(name: String, title: String,
                         uri: String): Either[String, Unit] = {
    val root = mapper.createObjectNode()
    root.put("type", "group")
    root.put("title", title)
    root.putObject("field_uri").putArray("und").addObject().put("url", uri)
    postNode(mapper.writeValueAsString(root))
  }

  /** K8: DELETE the node URI with X-CSRF-Token (DkanPurger.java:141-153). */
  def deleteDataset(id: String): Either[String, Unit] = {
    val headers = csrf // login failure aborts, like postNode
    Try(delete(client,
      if (id.startsWith("http")) id else s"$apiUri/node/$id", headers)).toEither
      .left.map(_.getMessage).flatMap {
        case (200, _) => Right(())
        case (c, b) => Left(s"HTTP $c: $b")
      }
  }

  /** DKAN groups are nodes too — deleted through the same node DELETE
    * (DkanPurger purges every node kind, DkanPurger.java:141-153).
    */
  def deleteOrganization(id: String): Either[String, Unit] = deleteDataset(id)

  /** S9: one node-listing page; the purger drains until the first empty
    * page (DkanPurger.java:100-138).
    */
  def listPage(page: Int): Seq[String] = {
    val (code, body) = get(client,
      s"$apiUri/node?pagesize=$pageSize&page=$page",
      Seq("Accept" -> "application/json"))
    if (code != 200) Nil
    else mapper.readTree(body).elements().asScala
      .map(_.path("uri").asText("")).filter(_.nonEmpty).toSeq
  }

  /** Drain until the first RAW-EMPTY response array (DkanPurger.java
    * :100-138 stops on an empty page regardless of page content) — a page
    * whose nodes all lack the extracted field still advances the drain
    * instead of silently truncating pagination. A non-200 or malformed
    * page stops the drain: the reference has no retry, and continuing
    * past a broken endpoint risks an unbounded page loop.
    */
  private def drainPages(uri: Int => String,
                         extract: JsonNode => String): Seq[String] =
    Iterator.from(0).map { p =>
      Try {
        val (code, body) = get(client, uri(p), Seq("Accept" -> "application/json"))
        if (code != 200) (false, Seq.empty[String])
        else {
          val arr = mapper.readTree(body).elements().asScala.toSeq
          (arr.nonEmpty, arr.map(extract).filter(_.nonEmpty))
        }
      }.getOrElse((false, Seq.empty[String]))
    }.takeWhile(_._1).flatMap(_._2).toSeq
}
