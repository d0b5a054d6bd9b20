package graft.sinks

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.operators.CurrentState

/**
 * DDL surface — the reference's `-bq` flow (O3-O5, `/root/reference/
 * bigquery.go:20-207`) re-expressed against the Spark session catalog:
 *
 *  - O3 dataset create        -> `CREATE DATABASE IF NOT EXISTS`
 *  - O4 `<t>_cdc` log table   -> external parquet table over the
 *                                AppendSink log location
 *  - O5 current-state view    -> a view named after the bare table with
 *                                latest-row-per-key semantics (W1), only
 *                                when a primary key is known
 *                                (`bigquery.go:105`)
 */
object Ddl {

  private def q(ident: String): String = s"`${ident.replace("`", "``")}`"

  /** O3 — idempotent database creation (`bigquery.go:123-150`). */
  def ensureDatabase(spark: SparkSession, db: String): Unit =
    spark.sql(s"CREATE DATABASE IF NOT EXISTS ${q(db)}")

  /** O4 — register the append-only log as an external table so plain SQL
    * reaches it (`CREATE_NEVER` semantics: the data files are the truth,
    * the catalog entry just points at them). */
  def registerCdcTable(spark: SparkSession, db: String, table: String,
                       basePath: String): Unit = {
    val name = s"${q(db)}.${q(AppendSink.cdcTableName(table))}"
    spark.sql(s"DROP TABLE IF EXISTS $name")
    spark.sql(
      s"CREATE TABLE $name USING parquet " +
        s"LOCATION '$basePath/${AppendSink.cdcTableName(table)}'")
    // the log is hive-style partitioned by snapshot_dt: recover partitions
    // so the catalog sees them (new appends need a re-repair or
    // `ALTER TABLE ... ADD PARTITION` per batch).
    spark.sql(s"MSCK REPAIR TABLE $name")
  }

  /** O5 — the current-state view over the log (W1), as a session temp
    * view named after the bare source table. */
  def createCurrentStateView(spark: SparkSession, table: String, log: DataFrame,
                             pkCol: String, orderTiebreak: Seq[String] = Nil): Unit =
    CurrentState.latestByKeyAgg(log, Seq(pkCol), "snapshot_tm", orderTiebreak)
      .createOrReplaceTempView(table)
}
