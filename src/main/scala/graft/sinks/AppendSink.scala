package graft.sinks

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/**
 * Append-only snapshot-log sinks, replacing the reference's Benthos
 * `gcp_bigquery` output (`/root/reference/benthos.go:110-144`: WRITE_APPEND,
 * strict schema, `max_bad_records: 0`) and `file` JSON-lines output
 * (`benthos.go:95-104`).
 *
 * The log table for source table `t` is `<t>_cdc`
 * (`/root/reference/benthos.go:141`, `bigquery.go:71`), partitioned by
 * capture date: at 100 TB the current-state view and retention both prune on
 * `snapshot_dt`, so per-window appends touch only new partitions and reads
 * of recent state skip the historical bulk.
 */
object AppendSink {

  def cdcTableName(table: String): String = s"${table}_cdc"

  /**
   * O1 — strict-schema append. `ignore_unknown_values: false` +
   * `max_bad_records: 0` semantics: any shape mismatch is an error, never a
   * silent drop.
   */
  def appendSnapshot(df: DataFrame, basePath: String, table: String,
                     expected: Option[StructType] = None): String = {
    expected.foreach { want =>
      require(df.schema == want,
        s"strict append schema mismatch for $table:\n got  ${df.schema.treeString}\n want ${want.treeString}")
    }
    val path = s"$basePath/${cdcTableName(table)}"
    df.withColumn("snapshot_dt", to_date(col("snapshot_tm")))
      .write.mode(SaveMode.Append)
      .partitionBy("snapshot_dt")
      .parquet(path)
    path
  }

  /** O2 — JSON-lines file sink (`OUTPUT_TYPE=FILE` path). */
  def appendJsonLines(df: DataFrame, basePath: String, table: String): String = {
    val path = s"$basePath/${cdcTableName(table)}_json"
    df.write.mode(SaveMode.Append).json(path)
    path
  }
}
