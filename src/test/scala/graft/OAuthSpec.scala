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
  * change. Zero egress: everything talks to localhost.
  *
  * Beyond-reference hardening covered here: the `state` nonce minted
  * at /login is persisted in a short-TTL HttpOnly cookie and VALIDATED
  * at the callback (the reference comments the check out at
  * auth.go:149) — a mismatched, missing, or cross-site-delivered state
  * fails closed with 401 before any token-endpoint round-trip. The
  * provider is a path parameter (`/oauth/{provider}/callback`,
  * router.go:76): a second IdP is a config-map entry, proven by the
  * two-provider test. */
class OAuthSpec extends SparkTestBase {

  private lazy val http = HttpClient.newHttpClient()
  private def get(url: String, cookie: String = ""): HttpResponse[String] = {
    val b = HttpRequest.newBuilder(URI.create(url)).GET()
    if (cookie.nonEmpty) b.header("Cookie", cookie)
    http.send(b.build(), HttpResponse.BodyHandlers.ofString())
  }

  /** Fake provider: /token accepts exactly one code with the right
    * client credentials and redirect_uri; /userinfo requires the
    * bearer token it minted. Records what it saw for assertions. */
  private def startProvider(clientId: String = "cid-1",
                            secret: String = "secret-1",
                            callbackSuffix: String = "/oauth/google/callback",
                            email: String = "alice@example.com")
      : (HttpServer, Int, () => Seq[String]) = {
    val seen = scala.collection.mutable.ArrayBuffer.empty[String]
    val srv = HttpServer.create(new InetSocketAddress("localhost", 0), 0)
    srv.createContext("/token", ex => {
      val form = new String(ex.getRequestBody.readAllBytes(), StandardCharsets.UTF_8)
      seen.synchronized { seen += s"token:$form" }
      val params = form.split("&").map(_.split("=", 2))
        .collect { case Array(k, v) => k -> java.net.URLDecoder.decode(v, "UTF-8") }.toMap
      val ok = params.get("grant_type").contains("authorization_code") &&
        params.get("code").contains("good-code") &&
        params.get("client_id").contains(clientId) &&
        params.get("client_secret").contains(secret) &&
        params.get("redirect_uri").exists(_.endsWith(callbackSuffix))
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
      val body = if (ok) s"""{"sub":"g-123","email":"$email","email_verified":true}"""
                 else """{"error":"unauthorized"}"""
      val code = if (ok) 200 else 401
      val bytes = body.getBytes(StandardCharsets.UTF_8)
      ex.sendResponseHeaders(code, bytes.length)
      ex.getResponseBody.write(bytes); ex.close()
    })
    srv.start()
    (srv, srv.getAddress.getPort, () => seen.synchronized(seen.toSeq))
  }

  private def cfgFor(providerPort: Int, clientId: String = "cid-1",
                     secret: String = "secret-1",
                     callbackPath: String = "/oauth/google/callback") =
    OAuthConfig(
      clientId = clientId, clientSecret = secret,
      authUrl = s"http://localhost:$providerPort/auth",
      tokenUrl = s"http://localhost:$providerPort/token",
      userinfoUrl = s"http://localhost:$providerPort/userinfo",
      redirectUri = s"http://localhost:0$callbackPath")

  private def newServer(providerPort: Int) = {
    val tmp = Files.createTempDirectory("graft-oauth").toString
    val srv = new GraftServer(spark, tmp,
      oauth = Some(new OAuthClient(cfgFor(providerPort))))
    srv.addApiKey("localkey", "default")
    val port = srv.start()
    (srv, s"http://localhost:$port")
  }

  /** The browser's half of the dance: GET /login, capture the state
    * nonce from the consent-URL redirect and the oauth_state cookie
    * that must accompany it back to the callback. */
  private def loginDance(base: String): (String, String) = {
    val r = get(s"$base/login")
    assert(r.statusCode() == 307)
    val loc = r.headers().firstValue("Location").get()
    val state = loc.split("[&?]").collectFirst {
      case kv if kv.startsWith("state=") => kv.stripPrefix("state=") }.get
    val cookie = r.headers().allValues("Set-Cookie").stream()
      .filter(_.startsWith("oauth_state=")).findFirst().get().split(";")(0)
    (state, cookie)
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
      // the nonce is persisted browser-side so the callback can verify it
      val cookie = r.headers().allValues("Set-Cookie").stream()
        .filter(_.startsWith("oauth_state=")).findFirst()
      assert(cookie.isPresent, "state nonce must be stored in a cookie")
      assert(cookie.get().contains("HttpOnly") && cookie.get().contains("Max-Age=600"))
    } finally { srv.stop(); provider.stop(0) }
  }

  test("callback exchanges the code, creates the google user, sets the session cookie") {
    val (provider, pport, seen) = startProvider()
    val (srv, base) = newServer(pport)
    try {
      val (state, stateCookie) = loginDance(base)
      val r = get(s"$base/oauth/google/callback?code=good-code&state=$state", stateCookie)
      assert(r.statusCode() == 303)
      assert(r.headers().firstValue("Location").get() == "/dashboard")
      val cookie = r.headers().allValues("Set-Cookie").stream()
        .filter(_.startsWith("jwt=")).findFirst().get()
      assert(cookie.startsWith("jwt=") && cookie.contains("HttpOnly"))
      // the state cookie is single-use: expired on the callback response
      assert(r.headers().allValues("Set-Cookie").stream()
        .anyMatch(c => c.startsWith("oauth_state=;") && c.contains("Max-Age=0")))
      // the minted session is a REAL session: dashboard opens with it
      val dash = get(s"$base/dashboard", cookie.split(";")(0))
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
      val (state, stateCookie) = loginDance(base)
      val r = get(s"$base/oauth/google/callback?code=stolen-code&state=$state", stateCookie)
      assert(r.statusCode() == 401)
      assert(!r.headers().allValues("Set-Cookie").stream().anyMatch(_.startsWith("jwt=")),
        "no session on a failed exchange")
    } finally { srv.stop(); provider.stop(0) }
  }

  test("mismatched or missing state fails closed BEFORE the token exchange") {
    val (provider, pport, seen) = startProvider()
    val (srv, base) = newServer(pport)
    try {
      val (_, stateCookie) = loginDance(base)
      // attacker-delivered state that does not match the victim's cookie
      val r1 = get(s"$base/oauth/google/callback?code=good-code&state=forged", stateCookie)
      assert(r1.statusCode() == 401)
      assert(!r1.headers().allValues("Set-Cookie").stream().anyMatch(_.startsWith("jwt=")))
      // no cookie at all (cross-site navigation straight to callback)
      val (state2, _) = loginDance(base)
      val r2 = get(s"$base/oauth/google/callback?code=good-code&state=$state2")
      assert(r2.statusCode() == 401)
      // neither rejected request may have reached the provider
      assert(seen().isEmpty, "state must be verified before any provider round-trip")
    } finally { srv.stop(); provider.stop(0) }
  }

  test("a second identity provider is a config entry: /oauth/{provider}/callback") {
    val (p1, port1, _) = startProvider()
    val (p2, port2, seen2) = startProvider(clientId = "cid-2", secret = "secret-2",
      callbackSuffix = "/oauth/acme/callback", email = "bob@acme.io")
    val tmp = Files.createTempDirectory("graft-oauth2").toString
    val srv = new GraftServer(spark, tmp,
      oauth = Some(new OAuthClient(cfgFor(port1))),
      oauthProviders = Map("acme" -> new OAuthClient(
        cfgFor(port2, "cid-2", "secret-2", "/oauth/acme/callback"))))
    val base = s"http://localhost:${srv.start()}"
    try {
      val (state, stateCookie) = loginDance(base) // consent goes to the primary
      // ...but the acme callback route resolves the acme client
      val r = get(s"$base/oauth/acme/callback?code=good-code&state=$state", stateCookie)
      assert(r.statusCode() == 303, s"acme callback should log in: ${r.body()}")
      assert(seen2().exists(t => t.startsWith("token:") && t.contains("client_id=cid-2")),
        "the acme route must exchange against the acme provider")
      // unknown provider name is a 404, not a crash or a fallback
      val (s2, c2) = loginDance(base)
      assert(get(s"$base/oauth/nope/callback?code=x&state=$s2", c2).statusCode() == 404)
    } finally { srv.stop(); p1.stop(0); p2.stop(0) }
  }
}
