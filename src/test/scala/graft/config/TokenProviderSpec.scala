package graft.config

import com.sun.net.httpserver.{HttpExchange, HttpServer}
import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets.UTF_8
import java.util.concurrent.atomic.AtomicInteger
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** A1 token flows against a scripted local token endpoint: request wire
  * formats (client-credentials form, IMDS query + Metadata header,
  * workload-identity client_assertion), expiry-skew caching, rotated
  * assertion files, and loud failures. */
class TokenProviderSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var server: HttpServer = _
  private var base: String = _
  private val hits = new AtomicInteger(0)
  @volatile private var lastBody: String = ""
  @volatile private var lastUri: String = ""
  @volatile private var lastMetadataHeader: Option[String] = None
  @volatile private var respond: () => (Int, String) =
    () => (200, """{"access_token":"tok-1","expires_in":3600}""")

  override def beforeAll(): Unit = {
    server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/", (ex: HttpExchange) => {
      hits.incrementAndGet()
      lastUri = ex.getRequestURI.toString
      lastMetadataHeader = Option(ex.getRequestHeaders.getFirst("Metadata"))
      lastBody = new String(ex.getRequestBody.readAllBytes(), UTF_8)
      val (code, body) = respond()
      val bytes = body.getBytes(UTF_8)
      ex.sendResponseHeaders(code, bytes.length)
      ex.getResponseBody.write(bytes)
      ex.close()
    })
    server.start()
    base = s"http://127.0.0.1:${server.getAddress.getPort}"
  }
  override def afterAll(): Unit = server.stop(0)

  private def appAuth = AuthConfig(AuthStrategy.Application,
    appId = Some("app-1"), appKey = Some("s3cret+chars"), authority = Some("https://unused"))
  private val scope = "https://cluster.kusto.windows.net/.default"

  test("APPLICATION: client-credentials form POST, token cached until near expiry") {
    hits.set(0)
    var clock = 1000L
    val p = TokenProvider.forConfig(appAuth, scope,
      tokenEndpoint = Some(s"$base/tenant/oauth2/v2.0/token"), now = () => clock)
    respond = () => (200, """{"access_token":"tok-1","expires_in":3600}""")
    assert(p.token() == "tok-1")
    assert(lastBody.contains("grant_type=client_credentials"))
    assert(lastBody.contains("client_id=app-1"))
    assert(lastBody.contains("client_secret=s3cret%2Bchars"), s"secret must be url-encoded: $lastBody")
    assert(lastBody.contains("scope=https%3A%2F%2Fcluster.kusto.windows.net%2F.default"))
    // cached: no second hit while valid
    assert(p.token() == "tok-1" && hits.get() == 1)
    // inside the 120s skew window -> refresh
    respond = () => (200, """{"access_token":"tok-2","expires_in":3600}""")
    clock = 1000L + 3600L - 60L
    assert(p.token() == "tok-2" && hits.get() == 2)
  }

  test("MANAGED_IDENTITY: IMDS GET with Metadata header, resource derived from scope") {
    hits.set(0)
    val auth = AuthConfig(AuthStrategy.ManagedIdentity, managedIdentityId = Some("mi-42"))
    val p = TokenProvider.forConfig(auth, scope, imdsEndpoint = Some(base))
    // IMDS reports expires_in as a string — must parse
    respond = () => (200, """{"access_token":"imds-tok","expires_in":"3599"}""")
    assert(p.token() == "imds-tok")
    assert(lastMetadataHeader.contains("true"))
    assert(lastUri.contains("/metadata/identity/oauth2/token"))
    assert(lastUri.contains("resource=https%3A%2F%2Fcluster.kusto.windows.net"))
    assert(!lastUri.contains(".default"), "IMDS takes a resource, not an OAuth2 scope")
    assert(lastUri.contains("client_id=mi-42"))
    // system identity omits client_id
    val sys = TokenProvider.forConfig(
      AuthConfig(AuthStrategy.ManagedIdentity, managedIdentityId = Some("system")),
      scope, imdsEndpoint = Some(base))
    sys.token()
    assert(!lastUri.contains("client_id="))
  }

  test("WORKLOAD_IDENTITY: client_assertion read fresh from the rotated token file") {
    hits.set(0)
    val file = java.nio.file.Files.createTempFile("fed", ".jwt")
    java.nio.file.Files.writeString(file, "jwt-one\n")
    var clock = 5000L
    val p = TokenProvider.forConfig(
      AuthConfig(AuthStrategy.WorkloadIdentity, appId = Some("wl-app")), scope,
      tokenEndpoint = Some(s"$base/t/oauth2/v2.0/token"),
      federatedTokenFile = Some(file.toString), now = () => clock)
    respond = () => (200, """{"access_token":"wl-tok","expires_in":100}""")
    assert(p.token() == "wl-tok")
    assert(lastBody.contains("client_assertion_type=urn%3Aietf%3Aparams%3Aoauth%3A" +
      "client-assertion-type%3Ajwt-bearer"))
    assert(lastBody.contains("client_assertion=jwt-one"))
    assert(!lastBody.contains("client_secret"))
    // platform rotates the file; the refresh must read the NEW assertion
    java.nio.file.Files.writeString(file, "jwt-two")
    clock += 100L
    p.token()
    assert(lastBody.contains("client_assertion=jwt-two"))
  }

  test("AZ_DEV_TOKEN is a static passthrough; errors and bad bodies are loud") {
    val p = TokenProvider.forConfig(
      AuthConfig(AuthStrategy.AzDevToken, accessToken = Some("dev-tok")), scope)
    assert(p.token() == "dev-tok")

    respond = () => (400, """{"error":"invalid_client"}""")
    val bad = TokenProvider.forConfig(appAuth, scope, tokenEndpoint = Some(s"$base/t"))
    val e = intercept[TokenAcquisitionException](bad.token())
    assert(e.getMessage.contains("400") && e.getMessage.contains("invalid_client"))

    respond = () => (200, """{"nope":1}""")
    val noTok = TokenProvider.forConfig(appAuth, scope, tokenEndpoint = Some(s"$base/t"))
    assert(intercept[TokenAcquisitionException](noTok.token())
      .getMessage.contains("no access_token"))
  }
}
