package graft.sources

import java.sql.Timestamp
import java.util.Properties

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.schema.SourceColumn

/**
 * Abstraction over where the CDC engine captures from. The reference has
 * exactly one source (PostgreSQL over the wire, `/root/reference/
 * postgres.go`); here the engine is source-agnostic: the harness runs
 * file-backed, production runs JDBC, and both flow through the same
 * watermark-policy / snapshot / append loop.
 */
trait SnapshotSource {

  /** Full table scan (seed path: MIN(nms) + count). */
  def load(table: String): DataFrame

  /** Half-open `(lo, hi]` window on `nmsCol`, with the predicate evaluated
    * AT the source (parquet row-group pruning / database WHERE) — never a
    * Spark-side filter over a full scan. */
  def loadWindowed(table: String, nmsCol: String, lo: Timestamp, hi: Timestamp): DataFrame

  /** Cheap live row count for the watermark policy (S6). Implementations
    * must avoid scanning data Spark-side: parquet footers, database
    * statistics, or a database-local COUNT. */
  def liveRowCount(table: String): Long
}

/** Parquet-directory source — the harness default (`<dir>/<table>.parquet`). */
final class ParquetSource(spark: SparkSession, dir: String) extends SnapshotSource {
  override def load(table: String): DataFrame = Tables.load(spark, dir, table)
  override def loadWindowed(table: String, nmsCol: String,
                            lo: Timestamp, hi: Timestamp): DataFrame =
    Tables.loadWindowed(spark, dir, table, nmsCol, lo, hi)
  override def liveRowCount(table: String): Long =
    ParquetMeta.rowCount(spark, s"$dir/$table.parquet")
}

/**
 * JDBC source — the production path the reference runs exclusively
 * (`postgres.go:29-41,105-114`). The windowed snapshot is a [[SqlGen]]
 * query shipped whole to the database via `spark.read.jdbc`, so the
 * window predicate and projection execute source-side (the reference's
 * pushdown-by-construction, `postgres.go:52-53`).
 *
 * @param nowExpr   dialect spelling of the current-timestamp function
 * @param countViaQuery row counts run as a database-local COUNT; on
 *   PostgreSQL production deployments, prefer the O(1)
 *   `pg_class.reltuples` estimate the reference reads
 *   (`postgres.go:144-149`) by overriding `liveRowCount`.
 */
class JdbcSource(
    spark: SparkSession,
    url: String,
    props: Properties,
    schemaName: String,
    nowExpr: String = "now()") extends SnapshotSource {

  protected def read(query: String): DataFrame = {
    import scala.jdk.CollectionConverters._
    spark.read.format("jdbc")
      .option("url", url)
      .option("query", query)
      .options(props.asScala.toMap)
      .load()
  }

  private def quoted(ident: String): String =
    "\"" + ident.replace("\"", "\"\"") + "\""

  override def load(table: String): DataFrame =
    read(s"SELECT * FROM ${quoted(schemaName)}.${quoted(table)}")

  private val columnCache =
    new java.util.concurrent.ConcurrentHashMap[String, Seq[SourceColumn]]()

  /** Catalog metadata for [[SqlGen]]'s explicit projection, derived from
    * the JDBC schema and cached per table — the reference caches its
    * introspected catalog the same way (`postgres.go:201-269` runs once,
    * not per window). Production mode reads information_schema instead
    * (`SqlGen.discoveryQuery` / `TypeMapper`). */
  protected def sourceColumns(table: String): Seq[SourceColumn] =
    columnCache.computeIfAbsent(table, { t =>
      load(t).schema.fields.toIndexedSeq.zipWithIndex.map { case (f, i) =>
        val udt = f.dataType match {
          case org.apache.spark.sql.types.TimestampType => "timestamp"
          case org.apache.spark.sql.types.TimestampNTZType => "timestamp"
          case other => other.typeName
        }
        SourceColumn(f.name, udt, f.nullable, ordinalPosition = i + 1)
      }
    })

  override def loadWindowed(table: String, nmsCol: String,
                            lo: Timestamp, hi: Timestamp): DataFrame =
    // snapshot_tm is stamped Spark-side (batch-constant, P3): the source
    // query ships only the projection + window.
    read(SqlGen.snapshotQuery(schemaName, table, sourceColumns(table),
      nmsCol, lo, hi, munge = None, withSnapshotTm = false, nowExpr = nowExpr))

  override def liveRowCount(table: String): Long =
    // COUNT's JDBC type varies by dialect (Derby INTEGER, PG BIGINT)
    read(s"SELECT COUNT(*) AS c FROM ${quoted(schemaName)}.${quoted(table)}")
      .head().get(0) match {
      case l: Long => l
      case i: Integer => i.toLong
      case d: java.math.BigDecimal => d.longValue
      case other => other.toString.toLong
    }
}
