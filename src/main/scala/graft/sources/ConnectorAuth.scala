package graft.sources

import java.nio.charset.StandardCharsets.UTF_8

/** Connector authentication computations (SURVEY §2.1 S4): the signing /
  * header-assembly half of the reference's 9 SaaS pollers and its AWS
  * sinks, as deterministic pure functions. The live socket stays out of
  * engine scope (zero-egress container; the poller contract itself is
  * `sources/AppPoller.scala`), but everything the reference computes
  * BEFORE the socket — canonical strings, HMAC signatures, OAuth token
  * requests, JWT assertions, SigV4 derivation — is implemented here and
  * hash-proven against published vectors (RFC 2202, RFC 4231, RFC 7515
  * Appendix A.1, the AWS SigV4 documented `get-vanilla` example).
  *
  * Reference behaviors covered:
  *  - Duo signed requests: apps/_apps/duo.py:63-88 (HMAC-SHA1 over
  *    date\nGET\nhost\npath\nurlencode(params), Basic ikey:hexdigest).
  *  - Static bearer tokens: okta.py:109, slack.py (intercom.py:56 alike)
  *    `Authorization: Bearer <token>`.
  *  - OneLogin client-credentials exchange: onelogin.py:77-107 (token
  *    request headers+body, then the service's `bearer:<token>` form).
  *  - Box/GSuite service-account assertions: box.py / gsuite.py delegate
  *    RS256 JWTs to their SDKs; the compact-JWS assembly implemented
  *    here is signing-pluggable and hash-proven on the HS256 path.
  *  - AWS SigV4: every boto3 call the reference makes (firehose, dynamo,
  *    s3, sqs, lambda) rides this derivation.
  */
object ConnectorAuth {

  // ---------------------------------------------------------------- hmac

  /** HMAC over `msg` with `key`. `algo` is a JCA Mac name
    * ("HmacSHA1", "HmacSHA256", "HmacSHA512"). */
  def hmacBytes(algo: String, key: Array[Byte], msg: Array[Byte]): Array[Byte] = {
    val mac = javax.crypto.Mac.getInstance(algo)
    mac.init(new javax.crypto.spec.SecretKeySpec(key, algo))
    mac.doFinal(msg)
  }

  def hmacHex(algo: String, key: Array[Byte], msg: Array[Byte]): String =
    hex(hmacBytes(algo, key, msg))

  def sha256Hex(msg: Array[Byte]): String =
    hex(java.security.MessageDigest.getInstance("SHA-256").digest(msg))

  def hex(bytes: Array[Byte]): String =
    bytes.map(b => f"${b & 0xff}%02x").mkString

  // ------------------------------------------------------------ encoding

  private def unreserved(c: Char): Boolean =
    (c >= 'A' && c <= 'Z') || (c >= 'a' && c <= 'z') ||
      (c >= '0' && c <= '9') || c == '-' || c == '_' || c == '.' || c == '~'

  // iterates CODE POINTS, not chars — a surrogate pair must encode as
  // one 4-byte UTF-8 sequence (char-by-char would mangle astral-plane
  // input to '?' bytes and silently diverge from urllib)
  private def pctEncode(s: String, spaceAsPlus: Boolean): String = {
    val sb = new StringBuilder
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      if (cp < 128 && unreserved(cp.toChar)) sb.append(cp.toChar)
      else if (spaceAsPlus && cp == ' ') sb.append('+')
      else new String(Character.toChars(cp)).getBytes(UTF_8)
        .foreach(b => sb.append(f"%%${b & 0xff}%02X"))
      i += Character.charCount(cp)
    }
    sb.toString
  }

  /** RFC 3986 percent-encoding with the unreserved set kept (space →
    * `%20`, uppercase hex) — the SigV4 component encoder. */
  def percentEncode(s: String): String = pctEncode(s, spaceAsPlus = false)

  /** `urllib.parse.quote_plus` parity (urlencode's value encoder,
    * duo.py:70): space → `+`, the same `_.-~`+alnum safe set. */
  def quotePlus(s: String): String = pctEncode(s, spaceAsPlus = true)

  /** `urllib.parse.urlencode` parity over an ordered param list — the
    * exact string Duo signs (duo.py:69-70 passes the params dict
    * straight through, so order is the caller's insertion order). */
  def urlencode(params: Seq[(String, String)]): String =
    params.map { case (k, v) => s"${quotePlus(k)}=${quotePlus(v)}" }.mkString("&")

  // ----------------------------------------------------------------- duo

  /** The canonical string Duo signs (duo.py:69-70):
    * `date\nMETHOD\nhost\npath\nurlencode(params)`. Method is uppercased
    * defensively (the reference hardcodes 'GET'). */
  def duoCanonical(date: String, method: String, host: String, path: String,
      params: Seq[(String, String)]): String =
    Seq(date, method.toUpperCase, host, path, urlencode(params)).mkString("\n")

  /** Duo request headers (duo.py:63-88): HMAC-SHA1(secret, canonical)
    * hexdigest, then `Basic base64(ikey:hexdigest)` + Date + Host. */
  def duoAuthHeaders(date: String, host: String, path: String,
      params: Seq[(String, String)], integrationKey: String,
      secretKey: String): Map[String, String] = {
    val sig = hmacHex("HmacSHA1", secretKey.getBytes(UTF_8),
      duoCanonical(date, "GET", host, path, params).getBytes(UTF_8))
    val basic = java.util.Base64.getEncoder
      .encodeToString(s"$integrationKey:$sig".getBytes(UTF_8))
    Map("Date" -> date, "Authorization" -> s"Basic $basic", "Host" -> host)
  }

  // -------------------------------------------------------------- bearer

  /** Static-token bearer header (okta.py:109, slack.py:133,
    * intercom.py:56). */
  def bearerHeaders(token: String): Map[String, String] =
    Map("Authorization" -> s"Bearer $token")

  /** OneLogin's token request (onelogin.py:89-96): the authorization
    * header carries BOTH creds in a literal template, body asks for
    * client_credentials. Returns (headers, json body); the body keeps
    * `requests`' wire bytes (json.dumps' default `": "` separator). */
  def oneloginTokenRequest(clientId: String, clientSecret: String)
      : (Map[String, String], String) = (
    Map(
      "Authorization" -> s"client_id: $clientId, client_secret: $clientSecret",
      "Content-Type" -> "application/json"),
    """{"grant_type": "client_credentials"}""")

  /** OneLogin's resource-call header (onelogin.py:106-107) — the service
    * uses the non-standard lowercase `bearer:<token>` form. */
  def oneloginBearer(accessToken: String): Map[String, String] =
    Map("Authorization" -> s"bearer:$accessToken")

  // ----------------------------------------------------------------- jwt

  /** base64url without padding (RFC 7515 §2). */
  def base64Url(bytes: Array[Byte]): String =
    java.util.Base64.getUrlEncoder.withoutPadding.encodeToString(bytes)

  def base64UrlDecode(s: String): Array[Byte] =
    java.util.Base64.getUrlDecoder.decode(s)

  /** Compact JWS over the exact header/payload octets with a pluggable
    * signer — box.py/gsuite.py sign RS256 through their SDKs; the
    * assembly (base64url(header).base64url(payload).base64url(sig)) is
    * identical for any alg. */
  def jwsCompact(headerOctets: Array[Byte], payloadOctets: Array[Byte])(
      sign: Array[Byte] => Array[Byte]): String = {
    val input = base64Url(headerOctets) + "." + base64Url(payloadOctets)
    input + "." + base64Url(sign(input.getBytes(UTF_8)))
  }

  /** HS256 compact JWS — the hash-provable path (RFC 7515 Appendix A.1
    * vector in ConnectorAuthSpec / `s4_connector_auth`). */
  def jwtHs256(headerOctets: Array[Byte], payloadOctets: Array[Byte],
      key: Array[Byte]): String =
    jwsCompact(headerOctets, payloadOctets)(hmacBytes("HmacSHA256", key, _))

  // --------------------------------------------------------------- sigv4

  /** SigV4 canonical query string: params sorted by (encoded key,
    * encoded value), RFC 3986 component encoding. */
  def sigV4CanonicalQuery(params: Seq[(String, String)]): String =
    params.map { case (k, v) => (percentEncode(k), percentEncode(v)) }
      .sorted.map { case (k, v) => s"$k=$v" }.mkString("&")

  /** SigV4 canonical URI path: RFC 3986 dot-segment removal, then each
    * remaining segment percent-encoded ONCE MORE on top of its on-wire
    * form — the spec's double-encoding, which every service except S3
    * applies ('%' → "%25", so an already-encoded "%20" canonicalizes to
    * "%2520"). S3 signs the path exactly as sent (single-encoded, no
    * normalization): pass `normalize = false`. Empty → "/"; a trailing
    * slash (or a path ending in "." / "..") keeps the trailing slash. */
  def sigV4CanonicalPath(path: String, normalize: Boolean = true): String = {
    if (path.isEmpty) "/"
    else if (!normalize) path
    else {
      val parts = path.split("/", -1)
      val out = scala.collection.mutable.ArrayBuffer.empty[String]
      parts.foreach {
        case "" | "." => ()
        case ".."     => if (out.nonEmpty) out.remove(out.length - 1)
        case seg      => out += seg
      }
      val trailingSlash = path.endsWith("/") ||
        parts.last == "." || parts.last == ".."
      val body = out.map(percentEncode).mkString("/")
      val p = "/" + body + (if (trailingSlash && body.nonEmpty) "/" else "")
      if (p.isEmpty) "/" else p
    }
  }

  /** SigV4 canonical request. Path: [[sigV4CanonicalPath]] (dot-segment
    * normalization + double-encoding; S3-style raw paths via
    * `normalizePath = false`). Headers: lowercase names; values trimmed
    * with inner space/tab runs collapsed to one space (the spec's
    * trimall — quoted-string interiors are not special-cased here);
    * duplicate names merge into one line with values comma-joined in
    * appearance order; sorted by name; the signed-headers line derives
    * from the same list. `payloadSha` is hex SHA-256 of the body
    * ("" → e3b0c442...). */
  def sigV4CanonicalRequest(method: String, uri: String,
      query: Seq[(String, String)], headers: Seq[(String, String)],
      payloadSha: String, normalizePath: Boolean = true): String = {
    val canon = headers
      .map { case (k, v) => (k.toLowerCase, v.trim.replaceAll("[ \t]+", " ")) }
      .groupBy(_._1).view.mapValues(_.map(_._2).mkString(","))
      .toSeq.sortBy(_._1)
    Seq(
      method.toUpperCase,
      sigV4CanonicalPath(uri, normalizePath),
      sigV4CanonicalQuery(query),
      canon.map { case (k, v) => s"$k:$v\n" }.mkString,
      canon.map(_._1).mkString(";"),
      payloadSha).mkString("\n")
  }

  /** `date/region/service/aws4_request` credential scope. */
  def sigV4Scope(date: String, region: String, service: String): String =
    s"$date/$region/$service/aws4_request"

  def sigV4StringToSign(amzDate: String, scope: String,
      canonicalRequest: String): String =
    Seq("AWS4-HMAC-SHA256", amzDate, scope,
      sha256Hex(canonicalRequest.getBytes(UTF_8))).mkString("\n")

  /** The 4-step HMAC key derivation chain. */
  def sigV4SigningKey(secret: String, date: String, region: String,
      service: String): Array[Byte] = {
    val k1 = hmacBytes("HmacSHA256", ("AWS4" + secret).getBytes(UTF_8), date.getBytes(UTF_8))
    val k2 = hmacBytes("HmacSHA256", k1, region.getBytes(UTF_8))
    val k3 = hmacBytes("HmacSHA256", k2, service.getBytes(UTF_8))
    hmacBytes("HmacSHA256", k3, "aws4_request".getBytes(UTF_8))
  }

  def sigV4Signature(secret: String, date: String, region: String,
      service: String, stringToSign: String): String =
    hmacHex("HmacSHA256", sigV4SigningKey(secret, date, region, service),
      stringToSign.getBytes(UTF_8))

  def sigV4AuthorizationHeader(accessKey: String, scope: String,
      signedHeaders: String, signature: String): String =
    s"AWS4-HMAC-SHA256 Credential=$accessKey/$scope, " +
      s"SignedHeaders=$signedHeaders, Signature=$signature"
}
