package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * Central loader for the harness parquet tables (and, by extension, any
 * parquet-backed source table).
 *
 * The reference discovers source tables from the PostgreSQL catalog
 * (`/root/reference/postgres.go:201-269`); in the file-backed harness the
 * "catalog" is a directory of parquet files. This loader normalizes physical
 * quirks so the rest of the engine sees clean Spark types:
 *
 *  - parquet `TIMESTAMP(NANOS)` columns (which Spark refuses by default,
 *    PARQUET_TYPE_ILLEGAL) are read via
 *    `spark.sql.legacy.parquet.nanosAsLong` and converted to microsecond
 *    `TimestampType`, matching what every other engine (incl. the DuckDB
 *    oracle) sees.
 */
object Tables {

  /** All harness tables (TESTDATA.md). */
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Columns stored as TIMESTAMP(NANOS) per table — read as long nanos,
    * then converted to TimestampType (microseconds, UTC session tz). */
  private val nanosColumns: Map[String, Seq[String]] = Map(
    "events" -> Seq("ts"))

  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = spark.read.parquet(s"$dir/$name.parquet")
    nanosColumns.getOrElse(name, Nil).foldLeft(raw) { (df, c) =>
      if (df.schema(c).dataType == LongType)
        // integer `div`, not `/`: float division would round the sub-µs part
        // up, where every other reader (incl. the oracle) truncates.
        df.withColumn(c, timestamp_micros(expr(s"`$c` div 1000")))
      else df
    }
  }

  /** Register every table as a temp view so `spark.sql` works against it. */
  def registerAll(spark: SparkSession, dir: String): Unit =
    all.foreach(n => load(spark, dir, n).createOrReplaceTempView(n))

  /**
   * Load with a half-open time window `(lo, hi]` on `tsCol` pushed down to
   * the parquet scan.
   *
   * Needed because the plain `load` converts TIMESTAMP(NANOS) columns via
   * `timestamp_micros(ts div 1000)`, and a filter on that DERIVED column
   * cannot be pushed below the projection — `.explain` shows only
   * `IsNotNull` reaching the scan, so at scale no row groups are pruned.
   * Filtering the RAW nanosecond long first (the equivalent predicate
   * `ts > lo*1000 && ts <= hi*1000`) restores min/max pruning — the same
   * pushdown-by-construction the reference gets by inlining the window in
   * generated source SQL (`/root/reference/postgres.go:52-53`).
   */
  def loadWindowed(spark: SparkSession, dir: String, name: String,
                   tsCol: String, lo: java.sql.Timestamp,
                   hi: java.sql.Timestamp): DataFrame = {
    if (!nanosColumns.getOrElse(name, Nil).contains(tsCol)) {
      val df = load(spark, dir, name)
      // Type the bounds to the column: naive (NTZ) columns compare against
      // naive literals (the UTC rendering of the instant; session tz is UTC).
      def bound(t: java.sql.Timestamp) = df.schema(tsCol).dataType match {
        case TimestampNTZType =>
          lit(t.toInstant.atOffset(java.time.ZoneOffset.UTC).toLocalDateTime)
        case _ => lit(t)
      }
      df.filter(col(tsCol) > bound(lo) && col(tsCol) <= bound(hi))
    } else {
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val raw = spark.read.parquet(s"$dir/$name.parquet")
      def ns(t: java.sql.Timestamp): Long =
        t.getTime / 1000 * 1000000000L + t.getNanos.toLong
      // Pushdown SUPERSET on the raw nanos (wider by the sub-µs remainder
      // at each bound), then the exact µs-precision predicate again after
      // conversion — prune at the scan, stay boundary-exact.
      val pruned = raw.filter(col(tsCol) > lit(ns(lo)) && col(tsCol) <= lit(ns(hi) + 999L))
      val converted = nanosColumns(name).foldLeft(pruned) { (df, c) =>
        if (df.schema(c).dataType == LongType)
          df.withColumn(c, timestamp_micros(expr(s"`$c` div 1000")))
        else df
      }
      converted.filter(col(tsCol) > lit(lo) && col(tsCol) <= lit(hi))
    }
  }
}
