package graft.run

/** Secrets loading with fail-fast validation — SURVEY §2 C10.
  *
  * Mirrors the reference's `load_secrets()`
  * (`databricks/talkdesk_databricks_etl.py:35-73`): resolve a fixed set of
  * logical keys from a secret store, collect EVERY missing required key,
  * and fail fast with the full list (so an operator fixes the deployment
  * once, not one missing key per run). `token_url` is optional and
  * defaults, exactly like the reference's `talkdesk-token-url` arm.
  *
  * The store is abstracted as `String => Option[String]` — env vars
  * ([[fromEnv]]), a vault client, Spark conf, … anything. Keys:
  *
  *  - `client_id` / `client_secret` — OAuth client credentials
  *  - `token_url` — OPTIONAL, defaults to [[DefaultTokenUrl]]
  *  - `storage_client_id` / `storage_client_secret` / `storage_tenant_id`
  *    — object-store service principal
  *  - `storage_account` / `storage_container` — lake location
  */
object Secrets {

  final case class MissingSecrets(keys: Seq[String])
    extends RuntimeException(s"Missing required secrets: ${keys.mkString(", ")}")

  val TokenUrlKey = "token_url"
  val DefaultTokenUrl = "https://auth.example.com/oauth/token"

  /** Required logical keys (the reference's 8 minus the optional
    * token_url, which is handled separately).
    */
  val RequiredKeys: Seq[String] = Seq(
    "client_id", "client_secret",
    "storage_client_id", "storage_client_secret", "storage_tenant_id",
    "storage_account", "storage_container")

  /** Resolve and validate. Returns every required key plus `token_url`
    * (defaulted when absent or blank). Throws [[MissingSecrets]] listing
    * ALL missing required keys.
    */
  def load(get: String => Option[String]): Map[String, String] = {
    val resolved = RequiredKeys.flatMap(k => get(k).filter(_.nonEmpty).map(k -> _)).toMap
    val missing = RequiredKeys.filterNot(resolved.contains)
    if (missing.nonEmpty) throw MissingSecrets(missing)
    val tokenUrl = get(TokenUrlKey).filter(_.nonEmpty).getOrElse(DefaultTokenUrl)
    resolved + (TokenUrlKey -> tokenUrl)
  }

  /** Env-var store: logical key `client_id` ⇒ `GRAFT_SECRET_CLIENT_ID`. */
  def fromEnv(env: Map[String, String] = sys.env,
      prefix: String = "GRAFT_SECRET_"): Map[String, String] =
    load(k => env.get(prefix + k.toUpperCase))
}
