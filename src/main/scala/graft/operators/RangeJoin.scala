package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * RANGE (point-in-interval) JOIN — attach interval rows to the point rows
 * falling inside them. Spark plans a raw inequality join as
 * BroadcastNestedLoopJoin (quadratic per key); the scale formulation here
 * is the standard BINNING rewrite:
 *
 *  - every interval is exploded to the fixed-width time bins it overlaps
 *    (replication factor = interval length / bin width + 1);
 *  - every point carries its single bin;
 *  - bins equi-join (hash shuffle — AQE/skew handling apply as usual),
 *    and the exact half-open predicate `lo <= t < hi` filters residually.
 *
 * A (point, interval) match co-occurs in exactly ONE bin — the point's —
 * so the join produces no duplicates and needs no distinct. Pick
 * `binMicros` near the typical interval length: shorter bins replicate
 * intervals more, longer bins let more non-matches through to the
 * residual filter.
 */
object RangeJoin {

  /**
   * @param points      point side; `pointTimeCol` must be TimestampType
   * @param intervals   interval side; `loCol`/`hiCol` TimestampType,
   *                    half-open `[lo, hi)`
   * @param keyCols     additional equi-join keys (same names both sides)
   * @param binMicros   bin width in microseconds
   */
  def pointInIntervalJoin(
      points: DataFrame, intervals: DataFrame,
      keyCols: Seq[String],
      pointTimeCol: String, loCol: String, hiCol: String,
      binMicros: Long): DataFrame = {

    val p = points.withColumn("__bin",
      floor(unix_micros(col(pointTimeCol)) / binMicros))
    // empty intervals match nothing — and Spark's `sequence` would count
    // DOWNWARDS for them (stop < start auto-negates the step)
    val iv = intervals.filter(col(hiCol) > col(loCol)).withColumn("__bin",
      explode(sequence(
        floor(unix_micros(col(loCol)) / binMicros),
        floor((unix_micros(col(hiCol)) - 1) / binMicros))))

    p.join(iv, keyCols :+ "__bin")
      .filter(col(pointTimeCol) >= col(loCol) && col(pointTimeCol) < col(hiCol))
      .drop("__bin")
  }
}
