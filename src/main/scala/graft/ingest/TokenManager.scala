package graft.ingest

import java.time.Instant

/** OAuth2 client-credentials token cache — SURVEY §2 C1/E4.
  *
  * Re-expresses the reference's `TokenManager`
  * (`databricks/talkdesk_databricks_etl.py:76-131`): a cached token is reused
  * until `expires_in − 300 s` (floor 60 s) has elapsed; refresh is guarded by
  * double-checked locking so concurrent report tasks trigger at most one
  * refresh. `fetchToken` abstracts the HTTP POST (form payload → JSON
  * `access_token`/`expires_in`), so tests and the fake source inject a
  * deterministic issuer. In distributed mode, one instance lives per executor
  * (`databricks/talkdesk_databricks_etl_distributed.py:70-76`).
  */
final class TokenManager(
    fetchToken: () => TokenManager.Token,
    now: () => Instant = () => Instant.now()) extends Serializable {

  import TokenManager._

  @volatile private var cached: Option[CachedToken] = None

  /** expires_in − 300 s safety buffer, floor 60 s
    * (`databricks/talkdesk_databricks_etl.py:109-114`).
    */
  private def effectiveTtlSeconds(expiresIn: Long): Long =
    math.max(expiresIn - 300L, 60L)

  def token: String = {
    val t = cached
    if (t.exists(c => now().isBefore(c.refreshAt))) t.get.token.accessToken
    else refresh()
  }

  private def refresh(): String = synchronized {
    // double-check under the lock: another caller may have refreshed already
    cached match {
      case Some(c) if now().isBefore(c.refreshAt) => c.token.accessToken
      case _ =>
        val fresh = fetchToken()
        val ttl = effectiveTtlSeconds(fresh.expiresIn)
        cached = Some(CachedToken(fresh, now().plusSeconds(ttl)))
        fresh.accessToken
    }
  }

  /** visible for tests */
  private[ingest] def refreshAt: Option[Instant] = cached.map(_.refreshAt)
}

object TokenManager {
  /** `expires_in` defaults to 3600 when absent
    * (`databricks/talkdesk_databricks_etl.py:109`).
    */
  final case class Token(accessToken: String, expiresIn: Long = 3600L)
  private final case class CachedToken(token: Token, refreshAt: Instant)
}
