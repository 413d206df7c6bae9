package graft

import java.nio.charset.StandardCharsets.UTF_8
import org.scalatest.funsuite.AnyFunSuite
import graft.sources.ConnectorAuth._

/** S4 connector-auth computations pinned against PUBLIC vectors:
  * RFC 2202 (HMAC-SHA1), RFC 4231 (HMAC-SHA256), RFC 7515 Appendix A.1
  * (HS256 compact JWS), and the AWS SigV4 documentation `get-vanilla`
  * example (iam ListUsers, 20150830T123600Z). The same vectors back the
  * `s4_connector_auth` oracle row. */
class ConnectorAuthSpec extends AnyFunSuite {

  private def bytes(b: Int, n: Int) = Array.fill(n)(b.toByte)

  test("HMAC-SHA1 matches RFC 2202 cases 1-3") {
    assert(hmacHex("HmacSHA1", bytes(0x0b, 20), "Hi There".getBytes(UTF_8)) ===
      "b617318655057264e28bc0b6fb378c8ef146be00")
    assert(hmacHex("HmacSHA1", "Jefe".getBytes(UTF_8),
      "what do ya want for nothing?".getBytes(UTF_8)) ===
      "effcdf6ae5eb2fa2d27416d5f184df9c259a7c79")
    assert(hmacHex("HmacSHA1", bytes(0xaa, 20), bytes(0xdd, 50)) ===
      "125d7342b9ac11cd91a39af48aa17b4f63f175d3")
  }

  test("HMAC-SHA256 matches RFC 4231 cases 1-2") {
    assert(hmacHex("HmacSHA256", bytes(0x0b, 20), "Hi There".getBytes(UTF_8)) ===
      "b0344c61d8db38535ca8afceaf0bf12b881dc200c9833da726e9376c2e32cff7")
    assert(hmacHex("HmacSHA256", "Jefe".getBytes(UTF_8),
      "what do ya want for nothing?".getBytes(UTF_8)) ===
      "5bdcc146bf60754e6a042426089575c75a003f089d2739839dec58b964ec3843")
  }

  // RFC 7515 Appendix A.1: exact header/payload octets (note the \r\n +
  // space pretty-printing inside the JSON — the signature is over these
  // octets, not a re-serialization), key from the example JWK.
  private val jwsHeader =
    "{\"typ\":\"JWT\",\r\n \"alg\":\"HS256\"}".getBytes(UTF_8)
  private val jwsPayload =
    ("{\"iss\":\"joe\",\r\n \"exp\":1300819380,\r\n " +
      "\"http://example.com/is_root\":true}").getBytes(UTF_8)
  private val jwsKey = base64UrlDecode(
    "AyM1SysPpbyDfgZld3umj1qzKObwVMkoqQ-EstJQLr_T-1qS0gZH75aKtMN3Yj0iPS4hcgUuTwjAzZr1Z9CAow")

  test("HS256 compact JWS matches RFC 7515 Appendix A.1") {
    val compact = jwtHs256(jwsHeader, jwsPayload, jwsKey)
    val Array(h, p, sig) = compact.split("\\.")
    assert(h === "eyJ0eXAiOiJKV1QiLA0KICJhbGciOiJIUzI1NiJ9")
    assert(p === ("eyJpc3MiOiJqb2UiLA0KICJleHAiOjEzMDA4MTkzODAsDQogImh0dHA6Ly9le" +
      "GFtcGxlLmNvbS9pc19yb290Ijp0cnVlfQ"))
    assert(sig === "dBjftJeZ4CVP-mB92K27uhbUJU1p1r_wW1gFWFOEjXk")
  }

  // --- AWS SigV4 documented example: GET https://iam.amazonaws.com/
  //     ?Action=ListUsers&Version=2010-05-08, x-amz-date 20150830T123600Z,
  //     AKIDEXAMPLE / wJalrXUtnFEMI/K7MDENG+bPxRfiCYEXAMPLEKEY.
  private val emptySha =
    "e3b0c44298fc1c149afbf4c8996fb92427ae41e4649b934ca495991b7852b855"
  private val sigv4Creq = sigV4CanonicalRequest(
    "GET", "/", Seq("Action" -> "ListUsers", "Version" -> "2010-05-08"),
    Seq("host" -> "iam.amazonaws.com",
      "content-type" -> "application/x-www-form-urlencoded; charset=utf-8",
      "x-amz-date" -> "20150830T123600Z"),
    emptySha)

  test("SigV4 canonical request + hash match the AWS docs example") {
    assert(sigv4Creq ===
      """GET
        |/
        |Action=ListUsers&Version=2010-05-08
        |content-type:application/x-www-form-urlencoded; charset=utf-8
        |host:iam.amazonaws.com
        |x-amz-date:20150830T123600Z
        |
        |content-type;host;x-amz-date
        |""".stripMargin + emptySha)
    assert(sha256Hex(sigv4Creq.getBytes(UTF_8)) ===
      "f536975d06c0309214f805bb90ccff089219ecd68b2577efef23edd43b7e1a59")
  }

  test("SigV4 signing key, signature and header match the AWS docs example") {
    val secret = "wJalrXUtnFEMI/K7MDENG+bPxRfiCYEXAMPLEKEY"
    assert(hex(sigV4SigningKey(secret, "20150830", "us-east-1", "iam")) ===
      "c4afb1cc5771d871763a393e44b703571b55cc28424d1a5e86da6ed3c154a4b9")
    val scope = sigV4Scope("20150830", "us-east-1", "iam")
    val sts = sigV4StringToSign("20150830T123600Z", scope, sigv4Creq)
    assert(sts.startsWith("AWS4-HMAC-SHA256\n20150830T123600Z\n" +
      "20150830/us-east-1/iam/aws4_request\n"))
    val sig = sigV4Signature(secret, "20150830", "us-east-1", "iam", sts)
    assert(sig === "5d672d79c15b13162d9279b0855cfba6789a8edb4c82c400e06b5924a6f2b5d7")
    assert(sigV4AuthorizationHeader("AKIDEXAMPLE", scope,
      "content-type;host;x-amz-date", sig) ===
      "AWS4-HMAC-SHA256 Credential=AKIDEXAMPLE/20150830/us-east-1/iam/aws4_request, " +
        "SignedHeaders=content-type;host;x-amz-date, " +
        "Signature=5d672d79c15b13162d9279b0855cfba6789a8edb4c82c400e06b5924a6f2b5d7")
  }

  test("quote_plus / urlencode parity with urllib (duo.py:70 param string)") {
    assert(quotePlus("a b/c+d~e_f.g") === "a+b%2Fc%2Bd~e_f.g")
    assert(urlencode(Seq("mintime" -> "1601510400", "limit" -> "1000")) ===
      "mintime=1601510400&limit=1000")
    assert(urlencode(Seq("q" -> "föö bar")) === "q=f%C3%B6%C3%B6+bar")
    // astral-plane code points encode as ONE 4-byte UTF-8 sequence
    // (urllib: quote_plus('\U0001F600') == '%F0%9F%98%80')
    assert(quotePlus("😀") === "%F0%9F%98%80")
    assert(percentEncode("😀 x") === "%F0%9F%98%80%20x")
  }

  test("sigv4 canonical headers merge duplicates and collapse space runs") {
    val creq = sigV4CanonicalRequest("GET", "/", Seq.empty,
      Seq("X-Amz-Meta-A" -> "1", "host" -> "h", "x-amz-meta-a" -> " a  b "),
      emptySha)
    val lines = creq.split("\n")
    assert(lines(3) === "host:h")
    assert(lines(4) === "x-amz-meta-a:1,a b")
    assert(lines(6) === "host;x-amz-meta-a")
  }

  test("sigv4 trimall collapses tab runs and mixed space/tab padding") {
    val creq = sigV4CanonicalRequest("GET", "/", Seq.empty,
      Seq("host" -> "h", "x-pad" -> "\t a \t\t b\t "), emptySha)
    assert(creq.split("\n")(4) === "x-pad:a b")
  }

  test("sigv4 canonical path: dot-segment removal + double-encoding") {
    // the docs' get-vanilla shape is untouched
    assert(sigV4CanonicalPath("") === "/")
    assert(sigV4CanonicalPath("/") === "/")
    // RFC 3986 dot-segment removal
    assert(sigV4CanonicalPath("/foo/../bar") === "/bar")
    assert(sigV4CanonicalPath("/./foo") === "/foo")
    assert(sigV4CanonicalPath("/foo/bar/..") === "/foo/")
    assert(sigV4CanonicalPath("/a//b/") === "/a/b/")
    // ".." past the root is dropped, not an error
    assert(sigV4CanonicalPath("/../a") === "/a")
    // double-encoding: the on-wire (already-encoded) form encodes again
    assert(sigV4CanonicalPath("/documents%20and%20settings/") ===
      "/documents%2520and%2520settings/")
    // S3 style: the path signs exactly as sent
    assert(sigV4CanonicalPath("/a//b/./%20", normalize = false) === "/a//b/./%20")
    val creq = sigV4CanonicalRequest("GET", "/x/../y%2Fz", Seq.empty,
      Seq("host" -> "h"), emptySha)
    assert(creq.split("\n")(1) === "/y%252Fz")
  }

  test("duo canonical string and auth headers (duo.py:63-88 shape)") {
    val date = "Tue, 21 Aug 2018 17:00:00 -0000"
    val canon = duoCanonical(date, "GET", "api-xxx.duosecurity.com",
      "/admin/v1/logs/authentication", Seq("mintime" -> "1534870000"))
    assert(canon === date + "\nGET\napi-xxx.duosecurity.com\n" +
      "/admin/v1/logs/authentication\nmintime=1534870000")
    val hdrs = duoAuthHeaders(date, "api-xxx.duosecurity.com",
      "/admin/v1/logs/authentication", Seq("mintime" -> "1534870000"),
      "DIXXXXXXXXXXXXXXXXXX", "deadbeefdeadbeefdeadbeefdeadbeefdeadbeef")
    assert(hdrs("Date") === date)
    assert(hdrs("Host") === "api-xxx.duosecurity.com")
    // Authorization decodes to ikey:hex(hmac-sha1(secret, canonical))
    val basic = hdrs("Authorization").stripPrefix("Basic ")
    val decoded = new String(java.util.Base64.getDecoder.decode(basic), UTF_8)
    val Array(ikey, sig) = decoded.split(":")
    assert(ikey === "DIXXXXXXXXXXXXXXXXXX")
    assert(sig === hmacHex("HmacSHA1",
      "deadbeefdeadbeefdeadbeefdeadbeefdeadbeef".getBytes(UTF_8),
      canon.getBytes(UTF_8)))
    assert(sig.length === 40 && sig.forall(c => c.isDigit || (c >= 'a' && c <= 'f')))
  }

  test("bearer families (okta/slack/intercom + onelogin's nonstandard form)") {
    assert(bearerHeaders("tok123") === Map("Authorization" -> "Bearer tok123"))
    assert(oneloginBearer("abc") === Map("Authorization" -> "bearer:abc"))
    val (h, body) = oneloginTokenRequest("cid", "csec")
    assert(h("Authorization") === "client_id: cid, client_secret: csec")
    assert(h("Content-Type") === "application/json")
    // requests' json= path serializes via json.dumps' default ": "
    // separator — the wire bytes onelogin.py:95-96 actually sends
    assert(body === """{"grant_type": "client_credentials"}""")
  }

  test("sigv4 canonical query sorts and component-encodes") {
    assert(sigV4CanonicalQuery(Seq("b" -> "2", "a" -> "x y", "a" -> "x/z")) ===
      "a=x%20y&a=x%2Fz&b=2")
  }
}
