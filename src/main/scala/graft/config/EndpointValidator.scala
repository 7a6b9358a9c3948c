package graft.config

import java.net.URI

/** SSRF guard for cluster endpoint URLs: a sink config may only point at a
  * well-known Azure Data Explorer domain, so an attacker-controlled config
  * can never redirect AAD tokens or data to an arbitrary host.
  *
  * Behavior mirrors the reference validator
  * (reference: src/main/java/.../KustoEndpointUrlValidator.java:52-92):
  * blank URLs pass (optional config), `http://` is rejected outright,
  * a missing scheme gets `https://` prepended, and the host must match a
  * trusted suffix. The trusted-suffix set below is the public
  * WellKnownKustoEndpoints.json surface of the azure-kusto SDKs (all Azure
  * clouds + sovereign regions); tests may extend it via `extraTrusted`.
  */
object EndpointValidator {

  /** Public cloud + sovereign-cloud ADX DNS suffixes (case-insensitive).
    * Matching is suffix-based on the full host with a dot boundary, i.e.
    * `x.kusto.windows.net` matches, `evilkusto.windows.net` does not.
    */
  val TrustedSuffixes: Seq[String] = Seq(
    // Azure public cloud
    ".kusto.windows.net",
    ".kusto.azuresynapse.net",
    ".kustomfa.windows.net",
    ".kusto.data.microsoft.com",
    ".kusto.fabric.microsoft.com",
    ".playfab.com",
    ".playfabapi.com",
    // China (21Vianet)
    ".kusto.chinacloudapi.cn",
    ".kusto.azuresynapse.azure.cn",
    ".kustomfa.chinacloudapi.cn",
    // US Government
    ".kusto.usgovcloudapi.net",
    ".kustomfa.usgovcloudapi.net",
    ".kusto.azuresynapse.usgovcloudapi.net")

  /** Exact trusted hosts (regional gateways published without a wildcard). */
  val TrustedHosts: Set[String] = Set("kusto.aria.microsoft.com")

  /** Validates `url`; returns the normalized https URL.
    * @throws SinkConfigException if the URL is http, malformed, or points
    *         at a host outside the trusted set.
    */
  def validate(url: String, configKey: String, extraTrusted: Seq[String] = Nil): String = {
    if (url == null || url.trim.isEmpty) return url
    val trimmed = url.trim
    if (trimmed.toLowerCase.startsWith("http://"))
      throw new SinkConfigException(
        s"$configKey: HTTP is not supported. Only HTTPS endpoints are allowed: '$trimmed'")
    val normalized =
      if (trimmed.toLowerCase.startsWith("https://")) trimmed else s"https://$trimmed"
    val host =
      try Option(new URI(normalized).getHost).getOrElse("")
      catch {
        case e: Exception =>
          throw new SinkConfigException(s"$configKey: invalid URL format '$trimmed': ${e.getMessage}")
      }
    if (host.isEmpty)
      throw new SinkConfigException(s"$configKey: invalid URL format '$trimmed': no host")
    val h = host.toLowerCase
    // Dot-boundary matching for caller-supplied suffixes too: "kusto.windows.net"
    // (no leading dot) must trust "x.kusto.windows.net" and the bare host itself,
    // but never "evilkusto.windows.net".
    val trusted = TrustedHosts.contains(h) ||
      (TrustedSuffixes ++ extraTrusted).exists { s0 =>
        val s = s0.toLowerCase
        val dotted = if (s.startsWith(".")) s else "." + s
        h == dotted.stripPrefix(".") || h.endsWith(dotted)
      }
    if (!trusted)
      throw new SinkConfigException(
        s"$configKey: URL '$trimmed' does not point to a known Azure Data Explorer " +
          "endpoint. The hostname must match a well-known trusted Kusto domain.")
    normalized
  }
}
