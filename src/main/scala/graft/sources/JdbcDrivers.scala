package graft.sources

import graft.sources.pgwire.PgWireDriver

/** JDBC driver-class resolution for Postgres URLs.
  *
  * Production deployments ship pgjdbc (`org.postgresql.Driver`) on the
  * classpath and get its full feature set (server-side cursors for true
  * bounded-memory streaming, SCRAM auth, binary transfer). Environments
  * without it — like this offline build sandbox, which has a live
  * PostgreSQL server but no pgjdbc jar — fall back to the in-repo
  * [[graft.sources.pgwire.PgWireDriver]], whose Simple Query surface is
  * sufficient for every read path the engine exercises. The resolved
  * class is handed to Spark's `driver` option; `ensureRegistered` also
  * makes plain `DriverManager.getConnection` calls work for the fallback.
  */
object JdbcDrivers {

  val PgJdbcClass = "org.postgresql.Driver"

  private def present(className: String): Boolean =
    try { Class.forName(className); true }
    catch { case _: ClassNotFoundException => false }

  /** Driver class name to use for `url`, preferring pgjdbc. */
  def resolve(url: String): String =
    if (present(PgJdbcClass)) PgJdbcClass
    else if (url.startsWith("jdbc:postgresql://")) {
      PgWireDriver.ensureRegistered()
      PgWireDriver.ClassName
    } else PgJdbcClass // let the standard driver-not-found error surface

  /** Make `DriverManager.getConnection(url, …)` callable for `url` (the
    * anchor-connection path in [[SnapshotJdbcSource.pin]]). pgjdbc
    * self-registers via the service loader; the fallback needs a nudge. */
  def ensureManagerReady(url: String): Unit = {
    if (!present(PgJdbcClass) && url.startsWith("jdbc:postgresql://"))
      PgWireDriver.ensureRegistered()
  }
}
