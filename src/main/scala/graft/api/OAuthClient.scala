package graft.api

import java.net.{HttpURLConnection, URL, URLEncoder}
import java.nio.charset.StandardCharsets

/** OAuth 2.0 authorization-code client — the reference's Google SSO
  * exchange (/root/reference/pkg/api/auth.go:84-87 Login redirects to
  * AuthCodeURL; auth.go:146-193 OAuthCallback exchanges the code and
  * GETs the userinfo email), with the provider's three endpoints as
  * plain configuration instead of a hardwired Google dependency: a
  * production deployment points them at Google
  * (accounts.google.com/o/oauth2/auth, oauth2.googleapis.com/token,
  * openidconnect.googleapis.com/v1/userinfo — all public, published
  * endpoints); the zero-egress test suite points them at an
  * in-process fake provider and exercises the complete dance. Zero
  * dependencies: java.net.HttpURLConnection and the in-repo JSON
  * parser.
  */
final case class OAuthConfig(clientId: String, clientSecret: String,
                             authUrl: String, tokenUrl: String,
                             userinfoUrl: String, redirectUri: String,
                             scope: String = "openid email")

final class OAuthClient(cfg: OAuthConfig) {

  private def enc(s: String): String = URLEncoder.encode(s, "UTF-8")

  /** The provider's consent URL (oauth2.Config.AuthCodeURL): standard
    * authorization-code query with a caller-supplied `state` nonce. */
  def authCodeUrl(state: String): String =
    s"${cfg.authUrl}?response_type=code&client_id=${enc(cfg.clientId)}" +
      s"&redirect_uri=${enc(cfg.redirectUri)}&scope=${enc(cfg.scope)}" +
      s"&state=${enc(state)}"

  /** Code → access token (oauth2.Config.Exchange): one form-encoded
    * POST to the token endpoint. Returns None on any failure — the
    * callback treats that as a failed login, never a crash. */
  def exchange(code: String): Option[String] = {
    val form = Seq(
      "grant_type" -> "authorization_code", "code" -> code,
      "client_id" -> cfg.clientId, "client_secret" -> cfg.clientSecret,
      "redirect_uri" -> cfg.redirectUri)
      .map { case (k, v) => s"$k=${enc(v)}" }.mkString("&")
    httpRequest("POST", cfg.tokenUrl, Some(form), None).flatMap { body =>
      import graft.functions.JValue._
      scala.util.Try(graft.functions.JValue.parseObject(body)).toOption
        .flatMap(_.get("access_token").collect { case JStr(t) => t })
    }
  }

  /** Bearer-token userinfo fetch (auth.go:159 GETs the userinfo URL
    * with the token's client): Some((email, rawJson)) — the raw body
    * is persisted as the user row's details, as the reference does. */
  def userEmail(accessToken: String): Option[(String, String)] =
    httpRequest("GET", cfg.userinfoUrl, None, Some(accessToken)).flatMap { body =>
      import graft.functions.JValue._
      scala.util.Try(graft.functions.JValue.parseObject(body)).toOption
        .flatMap(_.get("email").collect { case JStr(e) if e.nonEmpty => (e, body) })
    }

  private def httpRequest(method: String, url: String, form: Option[String],
                          bearer: Option[String]): Option[String] = {
    try {
      val conn = new URL(url).openConnection().asInstanceOf[HttpURLConnection]
      conn.setRequestMethod(method)
      conn.setConnectTimeout(10000)
      conn.setReadTimeout(10000)
      bearer.foreach(t => conn.setRequestProperty("Authorization", s"Bearer $t"))
      form.foreach { f =>
        conn.setDoOutput(true)
        conn.setRequestProperty("Content-Type", "application/x-www-form-urlencoded")
        val out = conn.getOutputStream
        try out.write(f.getBytes(StandardCharsets.UTF_8)) finally out.close()
      }
      val code = conn.getResponseCode
      if (code / 100 != 2) { conn.disconnect(); return None }
      val in = conn.getInputStream
      val body = try new String(in.readAllBytes(), StandardCharsets.UTF_8)
                 finally in.close()
      Some(body)
    } catch { case _: Exception => None }
  }
}
