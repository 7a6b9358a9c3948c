package graft.config

import com.fasterxml.jackson.databind.ObjectMapper
import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.charset.StandardCharsets.UTF_8
import java.time.Duration

/** A1 — AAD token acquisition for the four auth strategies the reference
  * supports (reference: KustoSinkTask.java:78-135 builds the SDK
  * connection string per strategy; the SDK then runs these exact OAuth2
  * flows). Implemented on JDK HTTP only — the wire formats are public
  * OAuth2/IMDS contracts, no vendor SDK needed:
  *
  *  - APPLICATION        → client-credentials POST to the token endpoint
  *  - MANAGED_IDENTITY   → IMDS GET with `Metadata: true`
  *  - WORKLOAD_IDENTITY  → client-credentials with a `client_assertion`
  *                         read fresh from the platform's token file
  *  - AZ_DEV_TOKEN       → static token passthrough
  *
  * Tokens are cached per provider and refreshed [[TokenProvider.SkewSeconds]]
  * before expiry (single-flight under the provider's lock: one executor
  * JVM refreshes once, not once per ingest call). Endpoints are
  * constructor parameters so tests run against a local HTTP server; the
  * engine's proxy config (P2) plugs into the underlying client.
  */
trait TokenProvider {
  /** A currently-valid bearer token (refreshing if near expiry). */
  def token(): String
}

final class TokenAcquisitionException(msg: String) extends RuntimeException(msg)

object TokenProvider {
  /** Refresh this many seconds before the reported expiry. */
  val SkewSeconds: Long = 120L

  private[config] def httpClient(proxy: Option[ProxyConfig]): HttpClient = {
    val b = HttpClient.newBuilder().connectTimeout(Duration.ofSeconds(10))
    proxy.foreach(p => b.proxy(java.net.ProxySelector.of(
      new java.net.InetSocketAddress(p.host, p.port))))
    b.build()
  }

  /** Build the provider for a validated [[AuthConfig]]. `scope` is the
    * resource scope (e.g. `https://cluster.kusto.windows.net/.default`);
    * `tokenEndpoint`/`imdsEndpoint` default to the public AAD/IMDS URLs
    * derived from the config and are overridable for tests. */
  def forConfig(auth: AuthConfig, scope: String,
                tokenEndpoint: Option[String] = None,
                imdsEndpoint: Option[String] = None,
                federatedTokenFile: Option[String] = None,
                proxy: Option[ProxyConfig] = None,
                now: () => Long = () => System.currentTimeMillis() / 1000L): TokenProvider =
    auth.strategy match {
      case AuthStrategy.AzDevToken => new StaticTokenProvider(auth.accessToken.get)
      case AuthStrategy.Application =>
        new ClientCredentialsTokenProvider(
          tokenEndpoint.getOrElse(s"${auth.authority.get.stripSuffix("/")}/oauth2/v2.0/token"),
          auth.appId.get, clientSecret = Some(auth.appKey.get), assertionFile = None,
          scope, httpClient(proxy), now)
      case AuthStrategy.WorkloadIdentity =>
        val file = federatedTokenFile
          .orElse(sys.env.get("AZURE_FEDERATED_TOKEN_FILE"))
          .getOrElse(throw new SinkConfigException(
            "WORKLOAD_IDENTITY auth needs the platform token file (AZURE_FEDERATED_TOKEN_FILE)"))
        new ClientCredentialsTokenProvider(
          tokenEndpoint.getOrElse(s"${auth.authority.getOrElse("https://login.microsoftonline.com/common").stripSuffix("/")}/oauth2/v2.0/token"),
          auth.appId.getOrElse(""), clientSecret = None, assertionFile = Some(file),
          scope, httpClient(proxy), now)
      case AuthStrategy.ManagedIdentity =>
        new ManagedIdentityTokenProvider(
          imdsEndpoint.getOrElse("http://169.254.169.254"),
          auth.managedIdentityId.get, scope, httpClient(proxy), now)
    }
}

/** Shared cache-and-refresh skeleton: `fetch()` runs under the lock only
  * when the cached token is absent or inside the skew window. */
private[config] abstract class CachingTokenProvider(now: () => Long) extends TokenProvider {
  private var cached: Option[(String, Long)] = None // (token, expiresAtEpochSec)
  protected def fetch(): (String, Long)             // (token, expiresInSec)
  final def token(): String = synchronized {
    cached match {
      case Some((t, expAt)) if now() < expAt - TokenProvider.SkewSeconds => t
      case _ =>
        val (t, expiresIn) = fetch()
        cached = Some((t, now() + expiresIn))
        t
    }
  }
}

final class StaticTokenProvider(t: String) extends TokenProvider {
  def token(): String = t
}

/** OAuth2 client-credentials grant — APPLICATION (client_secret) and
  * WORKLOAD_IDENTITY (client_assertion JWT read fresh from the token
  * file on every refresh, as the platform rotates it). */
final class ClientCredentialsTokenProvider(
    tokenEndpoint: String,
    clientId: String,
    clientSecret: Option[String],
    assertionFile: Option[String],
    scope: String,
    client: HttpClient,
    now: () => Long) extends CachingTokenProvider(now) {

  protected def fetch(): (String, Long) = {
    def enc(s: String) = java.net.URLEncoder.encode(s, UTF_8)
    val secretParams = clientSecret.map(s => s"&client_secret=${enc(s)}").getOrElse("")
    val assertionParams = assertionFile.map { f =>
      val jwt = new String(java.nio.file.Files.readAllBytes(java.nio.file.Path.of(f)), UTF_8).trim
      "&client_assertion_type=" + enc("urn:ietf:params:oauth:client-assertion-type:jwt-bearer") +
        s"&client_assertion=${enc(jwt)}"
    }.getOrElse("")
    val body = s"grant_type=client_credentials&client_id=${enc(clientId)}&scope=${enc(scope)}" +
      secretParams + assertionParams
    OAuthHttp.postForToken(client, tokenEndpoint, body)
  }
}

/** Azure IMDS managed-identity flow: plain GET on the instance metadata
  * endpoint with the mandatory `Metadata: true` header; `clientId` is a
  * user-assigned identity's id, or "system" for the system identity. */
final class ManagedIdentityTokenProvider(
    imdsBase: String,
    clientId: String,
    scope: String,
    client: HttpClient,
    now: () => Long) extends CachingTokenProvider(now) {

  protected def fetch(): (String, Long) = {
    def enc(s: String) = java.net.URLEncoder.encode(s, UTF_8)
    // IMDS takes a RESOURCE, not a scope — strip OAuth2's /.default
    val resource = scope.stripSuffix("/.default").stripSuffix("/")
    val idParam = if (clientId == "system") "" else s"&client_id=${enc(clientId)}"
    val uri = s"${imdsBase.stripSuffix("/")}/metadata/identity/oauth2/token" +
      s"?api-version=2018-02-01&resource=${enc(resource)}$idParam"
    val req = HttpRequest.newBuilder(URI.create(uri))
      .header("Metadata", "true").GET().build()
    OAuthHttp.parseTokenResponse(client.send(req, HttpResponse.BodyHandlers.ofString()), uri)
  }
}

private[config] object OAuthHttp {
  private val mapper = new ObjectMapper()

  def postForToken(client: HttpClient, endpoint: String, formBody: String): (String, Long) = {
    val req = HttpRequest.newBuilder(URI.create(endpoint))
      .header("Content-Type", "application/x-www-form-urlencoded")
      .POST(HttpRequest.BodyPublishers.ofString(formBody, UTF_8))
      .build()
    parseTokenResponse(client.send(req, HttpResponse.BodyHandlers.ofString()), endpoint)
  }

  def parseTokenResponse(resp: HttpResponse[String], endpoint: String): (String, Long) = {
    if (resp.statusCode() / 100 != 2)
      throw new TokenAcquisitionException(
        s"token endpoint $endpoint returned HTTP ${resp.statusCode()}: ${resp.body().take(500)}")
    val root = mapper.readTree(resp.body())
    val tok = Option(root.get("access_token")).map(_.asText()).filter(_.nonEmpty)
      .getOrElse(throw new TokenAcquisitionException(
        s"token endpoint $endpoint response has no access_token"))
    // IMDS returns expires_in as a STRING; AAD as a number — accept both
    val expiresIn = Option(root.get("expires_in")).map(_.asLong())
      .filter(_ > 0).getOrElse(3600L)
    (tok, expiresIn)
  }
}
