package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/**
 * Bucketed-table helpers: pre-partition both sides of a recurring join on
 * the join key so the join is co-located — no shuffle at read time, ever.
 *
 * This is the 100 TB answer for the fact-to-fact joins that cannot
 * broadcast (e.g. lineitem ⨝ orders every day): pay one clustered write,
 * then every subsequent sort-merge join reads bucket-aligned files with
 * zero Exchange. (Dimension tables stay broadcast; AQE handles the
 * in-between.)
 */
object Bucketing {

  /** Write `df` as a bucketed, sorted table in the session catalog. */
  def writeBucketed(df: DataFrame, table: String, bucketCol: String,
                    numBuckets: Int = 32): Unit =
    df.write
      .mode(SaveMode.Overwrite)
      .bucketBy(numBuckets, bucketCol)
      .sortBy(bucketCol)
      .format("parquet")
      .saveAsTable(table)

  /** Join two bucketed tables on their bucket key. With matching bucket
    * counts the planner produces a shuffle-free sort-merge join. */
  def coLocatedJoin(spark: SparkSession, left: String, right: String,
                    key: String): DataFrame =
    spark.table(left).join(spark.table(right), key)

  /** Number of shuffle exchanges in the (non-adaptive) physical plan —
    * the thing bucketing is supposed to drive to zero. */
  def shuffleCount(df: DataFrame): Int =
    df.queryExecution.executedPlan.collect {
      case _: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => 1
    }.sum
}
