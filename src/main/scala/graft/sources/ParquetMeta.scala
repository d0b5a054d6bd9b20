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

  /** Exact row count of a parquet file or directory, from footers only
    * (zero Spark jobs, zero data pages read). */
  def rowCount(spark: SparkSession, path: String): Long = {
    val conf = spark.sessionState.newHadoopConf()
    val p = new Path(path)
    val fs = p.getFileSystem(conf)
    parquetFiles(fs, p).map(f => footerRowCount(f, conf)).sum
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
