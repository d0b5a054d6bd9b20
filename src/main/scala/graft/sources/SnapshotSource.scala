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
    numericScalar(
      read(s"SELECT COUNT(*) AS c FROM ${quoted(schemaName)}.${quoted(table)}")
        .head().get(0))

  /** JDBC numeric scalars arrive as dialect-dependent boxes. */
  protected final def numericScalar(v: Any): Long = v match {
    case null => -1L
    case l: Long => l
    case i: Integer => i.toLong
    case d: java.lang.Double => d.toLong
    case f: java.lang.Float => f.toLong
    case d: java.math.BigDecimal => d.longValue
    case other => other.toString.toDouble.toLong
  }
}

/**
 * PostgreSQL source: identical capture path to [[JdbcSource]], but the
 * per-tick row count reads the planner's statistics instead of running
 * `COUNT(*)` — the reference deliberately uses the O(1) estimate
 * (`/root/reference/postgres.go:137-156`: `reltuples/relpages *
 * pg_relation_size/block_size`) because an exact count is a server-side
 * full scan per tracked table per tick, which the watermark policy
 * (which only needs a batch-size signal, T1/T2) never justifies.
 *
 * `reltuples` is -1 until the first VACUUM/ANALYZE (PostgreSQL >= 14)
 * and `relpages` can be 0 on a fresh table — the reference divides
 * blindly; here those degenerate cases fall back to one exact COUNT.
 */
class PgSource(
    spark: SparkSession,
    url: String,
    props: Properties,
    schemaName: String) extends JdbcSource(spark, url, props, schemaName, nowExpr = "now()") {

  private def litStr(s: String): String = "'" + s.replace("'", "''") + "'"

  /** The reference's stats estimate, schema-qualified (the reference
    * matches on bare `relname`, which collides across schemas). Protected
    * so tests can swap in a dialect-compatible stand-in and so other
    * engines' stats views can be slotted the same way. */
  protected def statsRowCountQuery(table: String): String = {
    val regclass = s"${litStr(schemaName + "." + table)}::regclass"
    s"""SELECT CASE WHEN c.reltuples < 0 OR c.relpages = 0 THEN -1
       |  ELSE (c.reltuples / c.relpages) *
       |       (pg_relation_size($regclass) /
       |        current_setting('block_size')::integer)
       |  END AS rows
       |FROM pg_class c
       |WHERE c.oid = $regclass""".stripMargin
  }

  override def liveRowCount(table: String): Long = {
    val est = numericScalar(read(statsRowCountQuery(table)).head().get(0))
    if (est < 0) super.liveRowCount(table) else est
  }
}
