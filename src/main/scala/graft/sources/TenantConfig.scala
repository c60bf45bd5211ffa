package graft.sources

/** Tenant-configuration resolution (SURVEY.md §2.8, F23).
  *
  * The reference resolves `${VAR}`-shaped credential values from the
  * process environment at config load, keeping the original placeholder
  * when the variable is absent (core/tenant_manager.py:428-456). This is
  * a config-layer concern, not a query operator — it runs ON THE DRIVER
  * before any job is planned, and the resolved map is what gets
  * broadcast to executors (credentials must never ride in the plan as
  * literals, and executors may not share the driver's environment).
  */
object TenantConfig {

  /** A value is a placeholder iff it is EXACTLY `${NAME}` — the
    * reference does whole-value replacement, not embedded templating. */
  private val Placeholder = """^\$\{([^}]+)\}$""".r

  /** Resolve `${VAR}` credential values through `env` (injectable for
    * tests and for secret managers that are not the process env).
    * Unresolvable placeholders pass through unchanged, matching the
    * reference's keep-original-and-warn behavior. */
  def resolveCredentials(
      credentials: Map[String, String],
      env: String => Option[String] = sys.env.get): Map[String, String] =
    credentials.map {
      case (k, Placeholder(name)) => k -> env(name).getOrElse(s"$${$name}")
      case other => other
    }
}
