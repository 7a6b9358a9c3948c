package graft.config

/** A1 — authentication strategy surface (reference:
  * KustoSinkTask.java:78-135 createKustoEngineConnectionString; enum
  * KustoSinkConfig.java:503-505). The engine validates the combination at
  * config time; token acquisition for the resolved strategy lives in
  * [[TokenProvider]] (client-credentials / IMDS / workload-identity /
  * static, JDK HTTP only).
  */
sealed trait AuthStrategy
object AuthStrategy {
  /** AAD application: appId + appKey + authority (tenant). */
  case object Application extends AuthStrategy
  /** Azure managed identity: client id (or "system"). */
  case object ManagedIdentity extends AuthStrategy
  /** Workload identity federation (token file supplied by the platform). */
  case object WorkloadIdentity extends AuthStrategy
  /** Developer az-cli token passthrough. */
  case object AzDevToken extends AuthStrategy

  def parse(s: String): AuthStrategy = s.trim.toUpperCase match {
    case "APPLICATION"       => Application
    case "MANAGED_IDENTITY"  => ManagedIdentity
    case "WORKLOAD_IDENTITY" => WorkloadIdentity
    case "AZ_DEV_TOKEN"      => AzDevToken
    case other => throw new SinkConfigException(
      s"auth.strategy must be one of APPLICATION|MANAGED_IDENTITY|WORKLOAD_IDENTITY|AZ_DEV_TOKEN, got '$other'")
  }
}

final case class AuthConfig(
    strategy: AuthStrategy,
    appId: Option[String] = None,
    appKey: Option[String] = None,
    authority: Option[String] = None,
    managedIdentityId: Option[String] = None,
    accessToken: Option[String] = None) {

  strategy match {
    case AuthStrategy.Application =>
      if (appId.forall(_.isEmpty) || appKey.forall(_.isEmpty) || authority.forall(_.isEmpty))
        throw new SinkConfigException(
          "APPLICATION auth requires aad.auth.appid, aad.auth.appkey and aad.auth.authority")
    case AuthStrategy.ManagedIdentity =>
      if (managedIdentityId.forall(_.isEmpty))
        throw new SinkConfigException(
          "MANAGED_IDENTITY auth requires aad.auth.appid (client id or 'system')")
    case AuthStrategy.AzDevToken =>
      if (accessToken.forall(_.isEmpty))
        throw new SinkConfigException("AZ_DEV_TOKEN auth requires aad.auth.accesstoken")
    case AuthStrategy.WorkloadIdentity => // platform-provided, nothing required here
  }
}

object AuthConfig {
  def fromProps(props: Map[String, String]): AuthConfig = {
    def opt(k: String) = props.get(k).filter(_.nonEmpty)
    AuthConfig(
      strategy = AuthStrategy.parse(props.getOrElse("aad.auth.strategy", "APPLICATION")),
      appId = opt("aad.auth.appid"),
      appKey = opt("aad.auth.appkey"),
      authority = opt("aad.auth.authority"),
      managedIdentityId = opt("aad.auth.appid"),
      accessToken = opt("aad.auth.accesstoken"))
  }
}

/** P2 — egress proxy for the ingest/engine clients (reference:
  * KustoSinkTask.java:311-317; config KustoSinkConfig.java:356-375). */
final case class ProxyConfig(host: String, port: Int) {
  if (host == null || host.trim.isEmpty)
    throw new SinkConfigException("proxy.host must be non-empty")
  if (port <= 0 || port > 65535)
    throw new SinkConfigException(s"proxy.port must be in (0, 65535], got $port")
}

object ProxyConfig {
  /** Both-or-neither: a lone host or lone port is a config error. */
  def fromProps(props: Map[String, String]): Option[ProxyConfig] = {
    val host = props.get("proxy.host").filter(_.nonEmpty)
    val port = props.get("proxy.port").filter(_.nonEmpty)
    (host, port) match {
      case (Some(h), Some(p)) =>
        val pn = try p.toInt catch {
          case _: NumberFormatException => throw new SinkConfigException(s"proxy.port must be an int, got '$p'")
        }
        Some(ProxyConfig(h, pn))
      case (None, None) => None
      case _ => throw new SinkConfigException("proxy.host and proxy.port must be set together")
    }
  }
}
