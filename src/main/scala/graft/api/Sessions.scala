package graft.api

import java.nio.charset.StandardCharsets
import java.util.Base64
import javax.crypto.Mac
import javax.crypto.spec.SecretKeySpec

/** Browser login sessions: a standard HS256 JWT carried in an
  * HttpOnly cookie, exactly the reference's session mechanics
  * (/root/reference/pkg/api/auth.go:86-90 Login, 137-144 Logout,
  * 146-193 OAuthCallback → CreateUser → jwtauth token with a
  * `user_id` claim and 7-day expiry → `jwt` cookie → /dashboard;
  * Authenticator at auth.go:92-135 redirects to /login when the
  * token is missing/invalid or the user no longer exists).
  *
  * Only the identity PROVIDER differs: the reference exchanges a
  * Google OAuth code for the user's email; this container has zero
  * egress, so the local provider proves identity by presenting a
  * valid API key for this server (admin or tenant) alongside the
  * email. Everything downstream — user row, claims, signature,
  * cookie, expiry, redirects — is identical in shape.
  *
  * Zero dependencies: HMAC-SHA256 via javax.crypto, base64url via
  * java.util.Base64.
  */
final class Sessions(secret: String, ttlSeconds: Long = 7L * 24 * 3600) {
  private val b64 = Base64.getUrlEncoder.withoutPadding
  private def mac(data: String): Array[Byte] = {
    val m = Mac.getInstance("HmacSHA256")
    m.init(new SecretKeySpec(secret.getBytes(StandardCharsets.UTF_8), "HmacSHA256"))
    m.doFinal(data.getBytes(StandardCharsets.UTF_8))
  }
  private def enc(s: String): String =
    b64.encodeToString(s.getBytes(StandardCharsets.UTF_8))

  /** base64url(header).base64url({"user_id":N,"exp":sec}).base64url(hmac) */
  def mint(userId: Long, nowMs: Long): String = {
    val header = enc("""{"alg":"HS256","typ":"JWT"}""")
    val payload = enc(s"""{"user_id":$userId,"exp":${nowMs / 1000 + ttlSeconds}}""")
    s"$header.$payload.${b64.encodeToString(mac(s"$header.$payload"))}"
  }

  /** Some(userId) iff the signature checks out and `exp` is in the
    * future. Constant-time signature compare. */
  def verify(token: String, nowMs: Long): Option[Long] = {
    val parts = token.split("\\.")
    if (parts.length != 3) return None
    val expected = b64.encodeToString(mac(s"${parts(0)}.${parts(1)}"))
    if (!java.security.MessageDigest.isEqual(
      expected.getBytes(StandardCharsets.UTF_8),
      parts(2).getBytes(StandardCharsets.UTF_8))) return None
    try {
      val payload = new String(Base64.getUrlDecoder.decode(parts(1)), StandardCharsets.UTF_8)
      val obj = graft.functions.JValue.parseObject(payload)
      import graft.functions.JValue._
      val exp = obj.get("exp").collect { case JNum(raw) => raw.toLong }.getOrElse(0L)
      val uid = obj.get("user_id").collect { case JNum(raw) => raw.toLong }
      if (exp * 1000 > nowMs) uid else None
    } catch { case _: Exception => None }
  }
}

object Sessions {
  def randomSecret(): String = {
    val bytes = new Array[Byte](32)
    new java.security.SecureRandom().nextBytes(bytes)
    Base64.getUrlEncoder.withoutPadding.encodeToString(bytes)
  }

  /** The login form served at GET /login (the reference redirects to
    * Google here; the local provider renders a form that posts the
    * email + API-key credential to the same endpoint). Styled by the
    * shared design system, centered card like the reference's
    * Tailwind login. */
  val loginHtml: String =
    s"""<!doctype html>
       |<html lang="en">
       |<head><meta charset="utf-8"><title>graft login</title>
       |<style>
       |${Dashboard.sharedCss}
       | main { max-width: 24rem; margin-top: 5rem; }
       | input, button { width: 100%; margin-bottom: 0.75rem; }
       |</style></head>
       |<body>
       |<main>
       |<div class="card">
       |<h1>graft</h1>
       |<form method="post" action="/login">
       |  <label>Email <input name="email" type="email" required></label>
       |  <label>API key <input name="api_key" type="password" required></label>
       |  <button type="submit">Sign in</button>
       |</form>
       |<p class="err">__FLASH__</p>
       |</div>
       |</main>
       |</body></html>
       |""".stripMargin
}
