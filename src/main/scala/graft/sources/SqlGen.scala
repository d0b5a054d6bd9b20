package graft.sources

import java.sql.Timestamp
import java.time.format.DateTimeFormatter

import graft.schema.SourceColumn

/**
 * Generator for the windowed snapshot SELECT pushed down to a JDBC source —
 * the production-mode analog of `getTableNMSQuery`
 * (`/root/reference/postgres.go:43-115`). In the reference this SQL is
 * assembled by string `Replace` over a template that is itself produced by a
 * query against `information_schema`; here it is a pure function of the
 * cached catalog metadata.
 *
 * Differences by design (SURVEY §7.4): identifiers are quoted and literals
 * rendered through a single formatter rather than interpolated free-form
 * (the reference's string-built SQL is injection-prone,
 * `postgres.go:146-149,176,208`). Used via
 * `spark.read.jdbc(url, s"($sql) src", props)` so the window predicate is
 * evaluated entirely by the source database — the same pushdown-by-
 * construction the reference gets (`postgres.go:52-53`).
 */
object SqlGen {

  private val TsFmt = DateTimeFormatter.ofPattern("yyyy-MM-dd HH:mm:ss.SSSSSS")

  private def q(ident: String): String = "\"" + ident.replace("\"", "\"\"") + "\""

  // JDBC timestamp escape: translated to the dialect's literal by every
  // JDBC driver (ANSI `TIMESTAMP '...'` is rejected by e.g. Derby).
  private def tsLit(t: Timestamp): String =
    s"{ts '${t.toLocalDateTime.format(TsFmt)}'}"

  final case class MungeSql(minBound: Timestamp, toNull: Boolean)

  /**
   * One projected column. P2: array-typed columns (`_*` / `*vector` udt
   * names) are shipped as `array_to_json` text in compat mode
   * (`/root/reference/postgres.go:59-60`); M1-M3: timestamp columns get the
   * munging CASE (`postgres.go:72-101`).
   */
  def projectColumn(c: SourceColumn, munge: Option[MungeSql],
                    jsonArrays: Boolean = false): String = {
    val u = c.udtName.toLowerCase
    val isArray = u.startsWith("_") || u.endsWith("vector")
    val isTs = u == "timestamp" || u == "timestamptz"
    if (isArray && jsonArrays)
      s"array_to_json(${q(c.name)}) AS ${q(c.name)}"
    else if (isTs && munge.isDefined) {
      val m = munge.get
      val repl = if (m.toNull) "NULL" else tsLit(m.minBound)
      s"CASE WHEN ${q(c.name)} < ${tsLit(m.minBound)} THEN $repl ELSE ${q(c.name)} END AS ${q(c.name)}"
    } else q(c.name)
  }

  /** The full windowed snapshot SELECT (S1): explicit projection in ordinal
    * order + `now() AS snapshot_tm` + half-open NMS window.
    *
    * `nowExpr` varies by dialect (`now()` on PostgreSQL — the reference's
    * form, `postgres.go:50` — `CURRENT_TIMESTAMP` on Derby/ANSI);
    * `withSnapshotTm = false` omits the column entirely for engines that
    * stamp a batch-constant `snapshot_tm` Spark-side (P3 determinism). */
  def snapshotQuery(
      schemaName: String,
      table: String,
      cols: Seq[SourceColumn],
      nmsColumn: String,
      lo: Timestamp,
      hi: Timestamp,
      munge: Option[MungeSql] = None,
      jsonArrays: Boolean = false,
      withSnapshotTm: Boolean = true,
      nowExpr: String = "now()"): String = {
    val proj = cols.sortBy(_.ordinalPosition)
      .map(projectColumn(_, munge, jsonArrays)).mkString(", ")
    val snapTm = if (withSnapshotTm) s", $nowExpr AS snapshot_tm" else ""
    s"SELECT $proj$snapTm FROM ${q(schemaName)}.${q(table)} " +
      s"WHERE ${q(nmsColumn)} > ${tsLit(lo)} AND ${q(nmsColumn)} <= ${tsLit(hi)}"
  }

  /** S3 — discovery: every table in a schema bearing the NMS column
    * (`/root/reference/postgres.go:208`). */
  def discoveryQuery(schemaName: String, nmsColumn: String): String =
    "SELECT table_name FROM information_schema.columns " +
      s"WHERE table_schema = '${schemaName.replace("'", "''")}' " +
      s"AND column_name = '${nmsColumn.replace("'", "''")}'"

  /** S5 — primary-key lookup (`/root/reference/postgres.go:124-128`), with
    * proper positional binding left to the JDBC layer. */
  def primaryKeyQuery(table: String): String =
    "SELECT kcu.column_name FROM information_schema.key_column_usage kcu " +
      "LEFT JOIN information_schema.table_constraints tc " +
      "ON kcu.constraint_name = tc.constraint_name " +
      s"WHERE tc.constraint_type = 'PRIMARY KEY' AND kcu.table_name = '${table.replace("'", "''")}'"

  /** S7 — seed watermark (`/root/reference/postgres.go:193`). */
  def seedWatermarkQuery(schemaName: String, table: String, nmsColumn: String): String =
    s"SELECT MIN(${q(nmsColumn)}) FROM ${q(schemaName)}.${q(table)}"
}
