package graft

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets.UTF_8

import com.sun.net.httpserver.{HttpExchange, HttpServer}
import org.scalatest.funsuite.AnyFunSuite

import graft.catalog.{CkanHttpClient, DkanHttpClient}

/** Request-construction tests for the live HTTP clients against an
  * in-process HTTP stub — URLs, methods, auth headers, form encoding and
  * status handling, per the reference's endpoint shapes
  * (DcatAp11ToCkanBatch.java:84-154, :213-251, :521-606;
  * DcatAp11ToDkanBatch.java:156-197; CkanManager.java:59-71;
  * DkanPurger.java:100-153). No Spark session needed — these are
  * driver-side edges.
  */
class HttpClientsSpec extends AnyFunSuite {

  case class Recorded(method: String, pathQuery: String,
                      headers: Map[String, String], body: String)

  /** Serves canned (status, body) by path; records every request. */
  private def withServer(routes: Map[String, (Int, String)])
                        (f: (String, () => Seq[Recorded]) => Unit): Unit = {
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    val recorded = collection.mutable.ArrayBuffer[Recorded]()
    server.createContext("/", (ex: HttpExchange) => {
      val body = new String(ex.getRequestBody.readAllBytes(), UTF_8)
      val q = Option(ex.getRequestURI.getRawQuery).map("?" + _).getOrElse("")
      // Keys lowercased: the JDK server normalizes header-name casing.
      val headers = {
        import scala.jdk.CollectionConverters._
        ex.getRequestHeaders.entrySet().asScala
          .map(e => e.getKey.toLowerCase -> e.getValue.get(0)).toMap
      }
      recorded.synchronized {
        recorded += Recorded(ex.getRequestMethod,
          ex.getRequestURI.getPath + q, headers, body)
      }
      // Query-keyed routes win over bare-path routes (pagination tests).
      val (status, resp) = routes.getOrElse(ex.getRequestURI.getPath + q,
        routes.getOrElse(ex.getRequestURI.getPath,
          (404, """{"error": "not found"}""")))
      val bytes = resp.getBytes(UTF_8)
      ex.sendResponseHeaders(status, bytes.length)
      ex.getResponseBody.write(bytes)
      ex.close()
    })
    server.start()
    try f(s"http://127.0.0.1:${server.getAddress.getPort}",
      () => recorded.synchronized(recorded.toSeq))
    finally server.stop(0)
  }

  test("CKAN organizations: list then show, uri extra maps uri to name") {
    withServer(Map(
      "/api/organization_list" -> (200, """{"result": ["org1", "org2"]}"""),
      "/api/organization_show" -> (200,
        """{"result": {"extras": [{"key": "x", "value": "y"},
          |{"key": "uri", "value": "https://pub.example"}]}}""".stripMargin)
    )) { (base, recorded) =>
      val c = new CkanHttpClient(s"$base/api", "KEY")
      val orgs = c.organizations()
      // Both orgs resolve through the same stub route; the uri extra wins.
      assert(orgs == Seq("https://pub.example" -> "org1",
        "https://pub.example" -> "org2"))
      val reqs = recorded()
      assert(reqs.head.pathQuery == "/api/organization_list")
      assert(reqs.map(_.pathQuery).contains("/api/organization_show?id=org1"))
      // Reads carry no Authorization header (reference queryClient has none).
      assert(!reqs.head.headers.contains("authorization"))
    }
  }

  test("CKAN packageShow: 200 parses resources, non-200 is None") {
    withServer(Map(
      "/api/package_show" -> (200,
        """{"result": {"resources": [
          |{"id": "r1", "url": "http://u", "distro_url": "http://d"},
          |{"id": "r2", "url": "http://u2"}]}}""".stripMargin)
    )) { (base, recorded) =>
      val c = new CkanHttpClient(s"$base/api", "KEY")
      assert(c.packageShow("ds one") ==
        Some(Seq(("r1", "http://u", "http://d"), ("r2", "http://u2", ""))))
      // URL-encoded id in the query.
      assert(recorded().head.pathQuery == "/api/package_show?id=ds+one")
      // Non-200 (the stub 404s unrouted paths) is "not found".
      val c404 = new CkanHttpClient(s"$base/nowhere", "KEY")
      assert(c404.packageShow("missing") == None)
    }
  }

  test("CKAN create/update: POST with Authorization, 409 is a distinct error") {
    withServer(Map(
      "/api/package_create" -> (200, """{"success": true}"""),
      "/api/package_update" -> (409, """{"error": "exists"}""")
    )) { (base, recorded) =>
      val c = new CkanHttpClient(s"$base/api", "SECRET-KEY")
      assert(c.createPackage("ds1", """{"name":"ds1"}""") == Right(()))
      val create = recorded().head
      assert(create.method == "POST")
      assert(create.pathQuery == "/api/package_create?id=ds1")
      assert(create.headers("authorization") == "SECRET-KEY")
      assert(create.body == """{"name":"ds1"}""")
      val upd = c.updatePackage("ds1", "{}")
      assert(upd.isLeft && upd.left.exists(_.contains("409")))
    }
  }

  test("CKAN organization_create body carries name, title and the uri extra") {
    withServer(Map(
      "/api/organization_create" -> (200, """{"success": true}""")
    )) { (base, recorded) =>
      val c = new CkanHttpClient(s"$base/api", "KEY")
      assert(c.createOrganization("cssz", "ČSSZ", "https://cssz.cz") == Right(()))
      val node = graft.catalog.Http.mapper.readTree(recorded().head.body)
      assert(node.path("name").asText() == "cssz")
      assert(node.path("title").asText() == "ČSSZ")
      assert(node.path("extras").get(0).path("key").asText() == "uri")
      assert(node.path("extras").get(0).path("value").asText() == "https://cssz.cz")
    }
  }

  test("CKAN deleteDataset posts {\"id\"} to dataset_purge") {
    withServer(Map(
      "/api/dataset_purge" -> (200, """{"success": true}""")
    )) { (base, recorded) =>
      val c = new CkanHttpClient(s"$base/api", "KEY")
      assert(c.deleteDataset("ds1") == Right(()))
      val req = recorded().head
      assert(req.method == "POST")
      assert(graft.catalog.Http.mapper.readTree(req.body)
        .path("id").asText() == "ds1")
      assert(req.headers("authorization") == "KEY")
    }
  }

  test("CKAN deleteOrganization posts {\"id\"} to organization_purge") {
    withServer(Map(
      "/api/organization_purge" -> (200, """{"success": true}""")
    )) { (base, recorded) =>
      val c = new CkanHttpClient(s"$base/api", "KEY")
      assert(c.deleteOrganization("org1") == Right(()))
      val req = recorded().head
      assert(req.pathQuery == "/api/organization_purge")
      assert(graft.catalog.Http.mapper.readTree(req.body)
        .path("id").asText() == "org1")
    }
  }

  test("CKAN listPage: page 0 is package_list, later pages are empty") {
    withServer(Map(
      "/api/package_list" -> (200, """{"result": ["a", "b"]}""")
    )) { (base, recorded) =>
      val c = new CkanHttpClient(s"$base/api", "KEY")
      assert(c.listPage(0) == Seq("a", "b"))
      assert(c.listPage(1) == Nil)
      assert(recorded().size == 1) // page 1 made no HTTP call
    }
  }

  test("DKAN: lazy form-encoded login, X-CSRF-Token on node posts") {
    withServer(Map(
      "/user/login" -> (200, """{"token": "tok-123"}"""),
      "/node" -> (200, """{"nid": "42"}""")
    )) { (base, recorded) =>
      val c = new DkanHttpClient(base, "user name", "p&ss")
      assert(c.createPackage("x", """{"title":"t"}""") == Right(()))
      val reqs = recorded()
      val login = reqs.head
      assert(login.method == "POST")
      assert(login.pathQuery == "/user/login")
      // UrlEncodedFormEntity parity, special chars encoded.
      assert(login.body == "username=user+name&password=p%26ss")
      assert(login.headers("accept") == "application/json")
      val post = reqs(1)
      assert(post.pathQuery == "/node")
      assert(post.headers("x-csrf-token") == "tok-123")
      // Second mutation reuses the token — no second login.
      assert(c.updatePackage("x", "{}") == Right(()))
      assert(recorded().count(_.pathQuery == "/user/login") == 1)
    }
  }

  test("DKAN listPage and node DELETE") {
    withServer(Map(
      "/user/login" -> (200, """{"token": "tok-9"}"""),
      "/node" -> (200,
        """[{"uri": "http://x/node/1"}, {"uri": "http://x/node/2"}]"""),
      "/node/7" -> (200, """{}""")
    )) { (base, recorded) =>
      val c = new DkanHttpClient(base, "u", "p")
      assert(c.listPage(0) == Seq("http://x/node/1", "http://x/node/2"))
      assert(recorded().head.pathQuery == "/node?pagesize=20&page=0")
      assert(c.deleteDataset("7") == Right(()))
      val del = recorded().last
      assert(del.method == "DELETE")
      assert(del.pathQuery == "/node/7")
      assert(del.headers("x-csrf-token") == "tok-9")
    }
  }

  test("DKAN group create posts field_uri so organizations() can map it back") {
    withServer(Map(
      "/user/login" -> (200, """{"token": "tok-1"}"""),
      "/node" -> (200, """{"nid": "5"}""")
    )) { (base, recorded) =>
      val c = new DkanHttpClient(base, "u", "p")
      assert(c.createOrganization("slug", "Publisher", "https://pub.example")
        == Right(()))
      val node = graft.catalog.Http.mapper.readTree(
        recorded().filter(_.pathQuery == "/node").head.body)
      assert(node.path("type").asText() == "group")
      assert(node.path("title").asText() == "Publisher")
      // The same path organizations() reads: field_uri.und[0].url.
      assert(node.path("field_uri").path("und").path(0).path("url").asText()
        == "https://pub.example")
    }
  }

  test("DKAN organizations drain past an extractless page, stop on raw-empty") {
    val pageUri = (p: Int) =>
      s"/node.json?parameters%5Btype%5D=group&pagesize=20&page=$p"
    withServer(Map(
      "/user/login" -> (200, """{"token": "t"}"""),
      // Page 0 is raw-NON-empty but yields no nids — the drain must
      // continue (DkanPurger stops on an EMPTY page, not an unproductive
      // one); page 2 is raw-empty and stops it.
      pageUri(0) -> (200, """[{"title": "group without nid"}]"""),
      pageUri(1) -> (200, """[{"nid": "7"}]"""),
      pageUri(2) -> (200, """[]"""),
      "/node/7.json" -> (200,
        """{"field_uri": {"und": [{"url": "https://pub7"}]}}""")
    )) { (base, recorded) =>
      val c = new DkanHttpClient(base, "u", "p")
      assert(c.organizations() == Seq("https://pub7" -> "7"))
      val pages = recorded().map(_.pathQuery).filter(_.startsWith("/node.json"))
      assert(pages == Seq(pageUri(0), pageUri(1), pageUri(2)))
    }
  }

  test("CKAN organizations skip an org whose show body is malformed") {
    withServer(Map(
      "/api/organization_list" -> (200, """{"result": ["bad", "good"]}"""),
      "/api/organization_show?id=bad" -> (200, "<html>not json</html>"),
      "/api/organization_show?id=good" -> (200,
        """{"result": {"extras": [{"key": "uri", "value": "https://ok"}]}}""")
    )) { (base, _) =>
      val c = new CkanHttpClient(s"$base/api", "KEY")
      // Parse failure on a 200 must log-and-continue, not abort the loop.
      assert(c.organizations() == Seq("https://ok" -> "good"))
    }
  }

  test("DKAN failed login surfaces the HTTP error") {
    withServer(Map(
      "/user/login" -> (403, """{"error": "bad credentials"}""")
    )) { (base, _) =>
      val c = new DkanHttpClient(base, "u", "wrong")
      val ex = intercept[RuntimeException](c.createPackage("x", "{}"))
      assert(ex.getMessage.contains("403"))
    }
  }
}
