package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * W1 — the "current state" view: collapse the append-only snapshot log to
 * the latest row per primary key, i.e. the reference's BigQuery view
 * `WHERE (pk, snapshot_tm) IN (SELECT (pk, MAX(snapshot_tm)) ... GROUP BY pk)`
 * (`/root/reference/bigquery.go:187-207`, view SQL at `bigquery.go:190`).
 *
 * Because the capture path is at-least-once (windows re-run on failure,
 * `/root/reference/cdc.go:127-137`), the log may hold duplicate (pk,
 * snapshot_tm) rows; this view is what restores exactly-once semantics
 * downstream.
 *
 * Scale note (100 TB): this is one shuffle by `pk`. For a continuously
 * maintained current-state table, prefer materializing incrementally (merge
 * per micro-batch) over re-running this across the full log; both forms are
 * provided.
 */
object CurrentState {

  /**
   * Latest row per key via `row_number`. `tiebreakCols` makes the result
   * deterministic when several rows share the max `orderCol` (the reference
   * view is nondeterministic there; we do better and document it).
   */
  def latestByKey(
      df: DataFrame,
      keyCols: Seq[String],
      orderCol: String,
      tiebreakCols: Seq[String] = Nil): DataFrame = {
    val ordering = (col(orderCol).desc +: tiebreakCols.map(col(_).desc))
    val w = Window.partitionBy(keyCols.map(col): _*).orderBy(ordering: _*)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }

  /**
   * Same semantics via partial-aggregating `max_by(struct(*), orderKey)` —
   * a single hash aggregate with map-side combine: cheaper than the window
   * form at scale (no per-partition sort of the whole log, and partial
   * aggregation collapses duplicates before the shuffle).
   */
  def latestByKeyAgg(
      df: DataFrame,
      keyCols: Seq[String],
      orderCol: String,
      tiebreakCols: Seq[String] = Nil): DataFrame = {
    val orderKey = struct((col(orderCol) +: tiebreakCols.map(col)): _*)
    val payload = struct(df.columns.map(col).toIndexedSeq: _*)
    df.groupBy(keyCols.map(col): _*)
      .agg(max_by(payload, orderKey).as("__latest"))
      .select(df.columns.toIndexedSeq.map(c => col(s"__latest.$c").as(c)): _*)
  }
}
