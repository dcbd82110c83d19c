package graft.sources

import java.sql.Types

import org.apache.spark.sql.jdbc.{JdbcDialect, JdbcDialects}
import org.apache.spark.sql.types.{DataType, MetadataBuilder, StringType}

/** Postgres dialect override mapping `uuid` (and other OTHER-typed pg
  * extension types) to Catalyst StringType — the Spark-native analogue of
  * the reference's psycopg2 OID-2950 adapter (`src/floorist/floorist.py:
  * 27-29,117-139`), which decodes uuid values as strings because the
  * parquet writer can't serialize UUID objects.
  *
  * Spark's built-in PostgresDialect already strings uuid in recent
  * versions; this dialect pins the behavior (and extends it to any
  * OTHER-typed column such as citext/inet) independent of Spark's default,
  * and is what [[JdbcSource]] relies on when no explicit `customSchema` is
  * given. Register once per JVM via [[GraftPostgresDialect.register]].
  */
object GraftPostgresDialect extends JdbcDialect {

  override def canHandle(url: String): Boolean =
    url.startsWith("jdbc:postgresql")

  override def getCatalystType(sqlType: Int, typeName: String, size: Int,
                               md: MetadataBuilder): Option[DataType] =
    (sqlType, typeName.toLowerCase(java.util.Locale.ROOT)) match {
      case (Types.OTHER, "uuid")   => Some(StringType)
      case (Types.OTHER, "citext") => Some(StringType)
      case (Types.OTHER, "inet")   => Some(StringType)
      case (Types.OTHER, "json")   => Some(StringType)
      case (Types.OTHER, "jsonb")  => Some(StringType)
      case _                       => None
    }

  @volatile private var registered = false

  /** Idempotent registration; custom dialects take precedence over Spark's
    * built-in PostgresDialect for matching URLs. */
  def register(): Unit = synchronized {
    if (!registered) {
      JdbcDialects.registerDialect(this)
      registered = true
    }
  }
}
