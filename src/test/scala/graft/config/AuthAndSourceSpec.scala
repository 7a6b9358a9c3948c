package graft.config

import graft.sources.KafkaSourceConfig
import org.scalatest.funsuite.AnyFunSuite

class AuthAndSourceSpec extends AnyFunSuite {

  test("auth strategies parse; invalid rejected") {
    assert(AuthStrategy.parse("application") == AuthStrategy.Application)
    assert(AuthStrategy.parse("MANAGED_IDENTITY") == AuthStrategy.ManagedIdentity)
    assert(AuthStrategy.parse("workload_identity") == AuthStrategy.WorkloadIdentity)
    assert(AuthStrategy.parse("AZ_DEV_TOKEN") == AuthStrategy.AzDevToken)
    assertThrows[SinkConfigException](AuthStrategy.parse("password"))
  }

  test("auth combinations: required fields enforced per strategy") {
    AuthConfig(AuthStrategy.Application, Some("app"), Some("key"), Some("tenant"))
    assertThrows[SinkConfigException](AuthConfig(AuthStrategy.Application, Some("app"), None, Some("t")))
    assertThrows[SinkConfigException](AuthConfig(AuthStrategy.ManagedIdentity))
    AuthConfig(AuthStrategy.ManagedIdentity, managedIdentityId = Some("system"))
    assertThrows[SinkConfigException](AuthConfig(AuthStrategy.AzDevToken))
    AuthConfig(AuthStrategy.AzDevToken, accessToken = Some("tok"))
    AuthConfig(AuthStrategy.WorkloadIdentity) // platform-provided
  }

  test("auth fromProps wires the connector property names") {
    val a = AuthConfig.fromProps(Map(
      "aad.auth.strategy" -> "application", "aad.auth.appid" -> "id",
      "aad.auth.appkey" -> "k", "aad.auth.authority" -> "tenant"))
    assert(a.strategy == AuthStrategy.Application && a.appId.contains("id"))
  }

  test("proxy: both-or-neither, port bounds") {
    assert(ProxyConfig.fromProps(Map.empty).isEmpty)
    assert(ProxyConfig.fromProps(Map("proxy.host" -> "p", "proxy.port" -> "8080"))
      .contains(ProxyConfig("p", 8080)))
    assertThrows[SinkConfigException](ProxyConfig.fromProps(Map("proxy.host" -> "p")))
    assertThrows[SinkConfigException](ProxyConfig.fromProps(Map("proxy.port" -> "8080")))
    assertThrows[SinkConfigException](ProxyConfig("p", 0))
    assertThrows[SinkConfigException](ProxyConfig("p", 70000))
  }

  test("kafka source: subscribe vs subscribePattern options") {
    val byList = KafkaSourceConfig("broker:9092", topics = Seq("a", "b"))
    assert(byList.options("subscribe") == "a,b")
    assert(!byList.options.contains("subscribePattern"))
    val byRegex = KafkaSourceConfig("broker:9092", topicsRegex = Some("multijson.topic.*"))
    assert(byRegex.options("subscribePattern") == "multijson.topic.*")
    assert(byRegex.options("startingOffsets") == "earliest")
  }

  test("kafka source: validation of subscription and offsets") {
    assertThrows[SinkConfigException](KafkaSourceConfig("b:9092"))
    assertThrows[SinkConfigException](
      KafkaSourceConfig("b:9092", topics = Seq("a"), topicsRegex = Some("x.*")))
    assertThrows[SinkConfigException](KafkaSourceConfig(""))
    assertThrows[SinkConfigException](
      KafkaSourceConfig("b:9092", topics = Seq("a"), startingOffsets = "sometimes"))
    assertThrows[SinkConfigException](
      KafkaSourceConfig("b:9092", topics = Seq("a"), maxOffsetsPerTrigger = Some(0)))
    val full = KafkaSourceConfig("b:9092", topics = Seq("a"),
      maxOffsetsPerTrigger = Some(50000), minPartitions = Some(64))
    assert(full.options("maxOffsetsPerTrigger") == "50000" && full.options("minPartitions") == "64")
    assert(!full.options.contains("includeHeaders"), "headers off by default")
    val withHeaders = KafkaSourceConfig("b:9092", topics = Seq("a"), includeHeaders = true)
    assert(withHeaders.options("includeHeaders") == "true")
  }
}
