package graft.util

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Skew-mitigation utilities for hot keys (the 100 TB toolkit: AQE's
 * skew-join handles sort-merge joins automatically, but aggregations and
 * broadcast-ineligible hot keys sometimes need explicit salting).
 */
object Skew {

  /** Deterministic salt in [0, salts) derived from the whole row of
    * `entropy` columns — spreads a hot key across `salts` reducers. */
  def salt(salts: Int, entropy: Column*): Column =
    pmod(xxhash64(entropy: _*), lit(salts.toLong)).cast("int")

  /**
   * Two-phase aggregation for skewed group keys: partial aggregate on
   * (key, salt), then final aggregate on key. Expressed for the common
   * count/sum shape; the pattern generalizes to any algebraic aggregate.
   */
  def saltedCount(df: DataFrame, keyCol: String, salts: Int = 16,
                  entropy: Seq[String] = Nil): DataFrame = {
    val ent = if (entropy.isEmpty) df.columns.toSeq.filterNot(_ == keyCol)
      else entropy
    df.withColumn("__salt", salt(salts, ent.map(col): _*))
      .groupBy(col(keyCol), col("__salt"))
      .agg(count(lit(1)).as("__partial"))
      .groupBy(col(keyCol))
      .agg(sum(col("__partial")).as("n"))
  }

  /**
   * Salted join for a skewed LEFT side against a modest-but-unbroadcastable
   * RIGHT side: left rows get a random-ish salt, right rows are replicated
   * `salts` times, and the join key becomes (key, salt) — the hot key's
   * rows land on `salts` different reducers.
   */
  def saltedJoin(left: DataFrame, right: DataFrame, key: String,
                 salts: Int = 16): DataFrame = {
    val saltedLeft = left.withColumn("__salt",
      salt(salts, left.columns.map(col).toIndexedSeq: _*))
    val replicatedRight = right
      .withColumn("__salt", explode(sequence(lit(0), lit(salts - 1))))
      .withColumn("__salt", col("__salt").cast("int"))
    saltedLeft.join(replicatedRight, Seq(key, "__salt")).drop("__salt")
  }
}
