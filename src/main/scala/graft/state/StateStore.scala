package graft.state

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, SaveMode, SparkSession}

/**
 * Per-table CDC state, mirroring the reference's SQLite `nmstables` row
 * (`/root/reference/nmsdb.go:54-66`: id, name, schema, table_schema,
 * bq_schema, nmsColumn, pkeyColumn, nms, last_row_count, dsn,
 * last_shoved_on). The two cached engine-specific schema blobs collapse to
 * one Spark `StructType` JSON (SURVEY §1.2).
 */
final case class TableState(
    name: String,
    schemaName: String,
    nmsColumn: String,
    pKeyColumn: Option[String],
    schemaJson: Option[String],
    nms: Timestamp,                // committed watermark
    lastRowCount: Long,
    dsn: Int,
    lastShovedOn: Option[Timestamp])

object StateStore {
  /** One table's watermark commit (T3), applied by [[StateStore.commitAll]]. */
  final case class Commit(dsn: Int, name: String, newNms: Timestamp,
                          rowCount: Long, shovedOn: Timestamp)
}

/**
 * Parquet-backed state catalog, replacing SQLite (`/root/reference/
 * nmsdb.go:33-212`). One row per (dsn, table); tiny — it is metadata, not
 * data — so read-modify-overwrite is fine at any scale (the 100 TB lives
 * in the captured tables, not here). Commits batch to ONE catalog rewrite
 * per engine tick ([[commitAll]]): the per-table rewrite this replaces was
 * O(catalog) per table per tick — the tick bottleneck at 10k+ tracked
 * tables.
 *
 * Not reproduced from the reference: the 8-column / 7-placeholder INSERT
 * bug (`nmsdb.go:148-151`).
 */
final class StateStore(spark: SparkSession, dir: String) {
  import spark.implicits._

  private val path = s"$dir/nmstables"

  /** Catalog rewrites performed by this store (observability for the
    * one-write-per-tick contract; a per-table regression shows up here). */
  val catalogWrites = new java.util.concurrent.atomic.AtomicLong(0L)

  def read(): Dataset[TableState] = {
    val f = new java.io.File(path)
    if (!f.exists()) spark.emptyDataset[TableState]
    else spark.read.parquet(path).as[TableState]
  }

  def readForDsn(dsn: Int): Dataset[TableState] =
    // F4 — DSN ownership filter (`/root/reference/cdc.go:51-59`)
    read().filter(_.dsn == dsn)

  /** T4 — upsert by (dsn, name), replacing manual SELECT-then-INSERT/UPDATE
    * (`/root/reference/nmsdb.go:126-158`). */
  def upsert(states: Seq[TableState]): Unit = synchronized {
    val keys = states.map(s => (s.dsn, s.name)).toSet
    val kept = read().collect().filterNot(s => keys.contains((s.dsn, s.name)))
    write(kept.toSeq ++ states)
  }

  /** T3 — watermark commit for ONE table, called only after the sink
    * append succeeded (`/root/reference/cdc.go:127-137`,
    * `nmsdb.go:198-212`). Batch-capture callers should accumulate and use
    * [[commitAll]]: one catalog rewrite per tick, not per table. */
  def commit(dsn: Int, name: String, newNms: Timestamp, rowCount: Long,
             shovedOn: Timestamp): Unit =
    commitAll(Seq(StateStore.Commit(dsn, name, newNms, rowCount, shovedOn)))

  /** T3, batched: apply every commit in ONE read-modify-rewrite of the
    * catalog. Internally synchronized — concurrent capture threads no
    * longer serialize on a caller-side lock around per-table rewrites. */
  def commitAll(commits: Seq[StateStore.Commit]): Unit = {
    if (commits.isEmpty) return
    synchronized {
      val byKey = commits.map(c => (c.dsn, c.name) -> c).toMap
      val updated = read().collect().toSeq.map { s =>
        byKey.get((s.dsn, s.name)) match {
          case Some(c) => s.copy(nms = c.newNms, lastRowCount = c.rowCount,
            lastShovedOn = Some(c.shovedOn))
          case None => s
        }
      }
      write(updated)
    }
  }

  /** O8 — JSONL state backup (`/root/reference/nmsdb.go:160-177`). */
  def exportJsonl(outPath: String): Unit =
    read().toDF().coalesce(1).write.mode(SaveMode.Overwrite).json(outPath)

  private def write(states: Seq[TableState]): Unit = {
    catalogWrites.incrementAndGet()
    // Write to a temp dir then swap, so a crash mid-write cannot destroy the
    // previous state (the commit protocol relies on this file surviving).
    val tmp = s"$path.tmp"
    states.toDS().coalesce(1).write.mode(SaveMode.Overwrite).parquet(tmp)
    val target = new java.io.File(path)
    deleteRecursively(target)
    if (!new java.io.File(tmp).renameTo(target))
      throw new java.io.IOException(s"state swap failed: $tmp -> $path")
  }

  private def deleteRecursively(f: java.io.File): Unit = {
    if (f.isDirectory) f.listFiles().foreach(deleteRecursively)
    if (f.exists()) f.delete()
  }
}
