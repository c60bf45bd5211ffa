package graft.sources

import org.scalatest.funsuite.AnyFunSuite

/** F23 — `${VAR}` credential resolution (tenant_manager.py:428-456). */
class TenantConfigSpec extends AnyFunSuite {

  private val env = Map("API_KEY" -> "sk-123", "EMPTY" -> "")

  test("exact ${VAR} values resolve through the injected env") {
    val out = TenantConfig.resolveCredentials(
      Map("api_key" -> "${API_KEY}", "static" -> "plain"), env.get)
    assert(out == Map("api_key" -> "sk-123", "static" -> "plain"))
  }

  test("unresolvable placeholders keep the original value") {
    val out = TenantConfig.resolveCredentials(Map("k" -> "${MISSING}"), env.get)
    assert(out == Map("k" -> "${MISSING}"))
  }

  test("only whole-value placeholders interpolate — embedded ones don't") {
    val creds = Map(
      "embedded" -> "prefix-${API_KEY}",   // not exactly ${...}
      "empty_ok" -> "${EMPTY}",            // present-but-empty resolves
      "braces" -> "${}",                   // empty name never matches env
      "plain" -> "value")
    val out = TenantConfig.resolveCredentials(creds, env.get)
    assert(out("embedded") == "prefix-${API_KEY}")
    assert(out("empty_ok") == "")
    assert(out("braces") == "${}")
    assert(out("plain") == "value")
  }
}
