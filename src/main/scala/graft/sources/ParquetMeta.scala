package graft.sources

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileStatus, FileSystem, Path}
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.spark.sql.SparkSession

/**
 * Footer-metadata statistics for parquet sources.
 *
 * The reference's control loop never scans a table to size it: it reads the
 * O(1) catalog estimate (`/root/reference/postgres.go:144-149`,
 * `pg_class.reltuples`). The Spark/parquet analog is the file footer, which
 * carries an exact per-row-group row count — summing footers reads a few KB
 * of metadata per file instead of the data itself. At 100 TB the difference
 * is "a directory listing" vs "a full-corpus scan per tracked table per
 * tick".
 */
object ParquetMeta {

  /** (files signature) -> row count; a directory listing (cheap) decides
    * whether the footer sum (O(#files) metadata reads) can be reused —
    * the capture loop calls this per tracked table per tick, and source
    * tables change far less often than ticks fire. */
  private val countCache =
    new java.util.concurrent.ConcurrentHashMap[String, (Long, Long)]()

  /** Exact row count of a parquet file or directory, from footers only
    * (zero Spark jobs, zero data pages read). Cached against the file
    * listing (paths + sizes + mtimes), so an unchanged table costs one
    * listing, not one footer read per file. */
  def rowCount(spark: SparkSession, path: String): Long = {
    val conf = spark.sessionState.newHadoopConf()
    val p = new Path(path)
    val fs = p.getFileSystem(conf)
    val files = parquetFiles(fs, p).sortBy(_.getPath.toString)
    // order-sensitive mixing fold (a plain SUM of per-file hashes would let
    // compensating changes across files collide to the same signature)
    val sig = files.foldLeft(1125899906842597L) { (h, f) =>
      var z = h * 31L + f.getPath.toString.hashCode
      z = z * 31L + f.getLen
      z = z * 31L + f.getModificationTime
      z ^= (z >>> 27); z * 0x94D049BB133111EBL
    }
    val cached = countCache.get(path)
    if (cached != null && cached._1 == sig) cached._2
    else {
      val n = files.map(f => footerRowCount(f, conf)).sum
      countCache.put(path, (sig, n))
      n
    }
  }

  private def footerRowCount(f: FileStatus, conf: Configuration): Long = {
    val reader = ParquetFileReader.open(HadoopInputFile.fromStatus(f, conf))
    try reader.getRecordCount finally reader.close()
  }

  /** Data files under `p` (recursing into partition dirs), skipping
    * `_SUCCESS`/hidden files the same way Spark's file index does. */
  private def parquetFiles(fs: FileSystem, p: Path): Seq[FileStatus] = {
    val st = fs.getFileStatus(p)
    if (st.isFile) Seq(st)
    else
      fs.listStatus(p).toSeq.flatMap { c =>
        val n = c.getPath.getName
        if (n.startsWith("_") || n.startsWith(".")) Nil
        else if (c.isDirectory) parquetFiles(fs, c.getPath)
        else if (n.endsWith(".parquet")) Seq(c)
        else Nil
      }
  }
}
