package graft.operators

import java.sql.Timestamp

import java.time.ZoneOffset

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{TimestampNTZType, TimestampType}

/**
 * The core capture operator: a windowed snapshot scan of one source table.
 *
 * Re-expresses the reference's generated SELECT
 * (`/root/reference/postgres.go:43-115`):
 *   - F1 half-open NMS window `WHERE nms > lo AND nms <= hi`
 *     (`postgres.go:52-53`) — as a Catalyst filter, pushed down to the
 *     parquet/JDBC scan;
 *   - P1 explicit full projection in schema order (`postgres.go:49,62-66`);
 *   - M1-M3 invalid-timestamp munging (`postgres.go:72-101`) as
 *     `when/otherwise` columns over every timestamp column;
 *   - P3 the synthetic `snapshot_tm` (`postgres.go:50-51`,
 *     `bigquery.go:355-358`) — taken ONCE per batch (a fixed literal), not
 *     per-row `now()`, for determinism and idempotent re-runs.
 */
object Snapshot {

  /** Timestamp-munging options (SURVEY §2.4). Mirrors the env gates
    * MUNGE_TIMESTAMPS_BEFORE_MIN / _BEFORE_EPOCH x _TO_NULL / _TO_MIN. */
  final case class MungeConfig(
      minBound: Timestamp,
      toNull: Boolean = true) // false => clamp to minBound (M2)

  val Epoch: Timestamp = Timestamp.valueOf("1970-01-01 00:00:00")

  /** M1/M2/M3: `CASE WHEN ts < min THEN null|min ELSE ts END`. */
  def mungeTimestamp(c: Column, conf: MungeConfig): Column = {
    val replacement = if (conf.toNull) lit(null).cast(TimestampType) else lit(conf.minBound)
    when(c < lit(conf.minBound), replacement).otherwise(c)
  }

  /**
   * Windowed snapshot: F1 + P1 + M1-M3 + P3.
   *
   * @param df          the source table
   * @param nmsCol      the not-modified-since column
   * @param lo          exclusive lower bound
   * @param hi          inclusive upper bound
   * @param snapshotTm  batch-constant capture timestamp appended as `snapshot_tm`
   * @param munge       optional timestamp munging applied to every TimestampType column
   */
  def snapshotWindow(
      df: DataFrame,
      nmsCol: String,
      lo: Timestamp,
      hi: Timestamp,
      snapshotTm: Timestamp,
      munge: Option[MungeConfig] = None): DataFrame = {

    // F1: half-open (lo, hi] — a row exactly at `lo` was captured by the
    // previous window; a row exactly at `hi` belongs to this one.
    // Bounds are typed to the NMS column: naive (NTZ) columns get naive
    // literals (the UTC rendering of the instant, session tz being UTC).
    def bound(t: Timestamp): Column = df.schema(nmsCol).dataType match {
      case TimestampNTZType =>
        lit(t.toInstant.atOffset(ZoneOffset.UTC).toLocalDateTime)
      case _ => lit(t)
    }
    val windowed = df.filter(col(nmsCol) > bound(lo) && col(nmsCol) <= bound(hi))

    // P1 + M1-M3: explicit projection of every column in schema order,
    // munging timestamp columns when configured. The NMS column itself is
    // never munged (munging it could tear the window invariant).
    val projected = windowed.select(df.schema.fields.toIndexedSeq.map { f =>
      val c = col(f.name)
      munge match {
        case Some(m) if f.dataType == TimestampType && f.name != nmsCol =>
          mungeTimestamp(c, m).as(f.name)
        case _ => c
      }
    }: _*)

    // P3: batch-constant snapshot timestamp.
    projected.withColumn("snapshot_tm", lit(snapshotTm))
  }
}
