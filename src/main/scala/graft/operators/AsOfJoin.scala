package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * AS-OF JOIN — for each left row at time `t`, attach the right row with
 * the same key and the greatest right-time <= `t` (e.g. "which dimension
 * version / last seen event was current when this fact happened") — an
 * operator Spark lacks natively (DuckDB: `ASOF JOIN`, which is exactly
 * the oracle used to check this implementation).
 *
 * Formulation chosen for 100 TB, NOT the naive one:
 *  - the naive inequality join (`l.key = r.key AND r.t <= l.t` + latest
 *    per left row) plans as BroadcastNestedLoop/cartesian-per-key and
 *    explodes with the number of right versions;
 *  - here both sides are UNIONED and windowed: tag rows (right=0,
 *    left=1), sort each key's timeline once, and carry the last non-null
 *    right payload forward (`last(..., ignoreNulls)` over rows between
 *    unbounded preceding and current). One shuffle on the key, one
 *    per-partition sort, zero row multiplication — the merge-join shape
 *    every as-of engine uses.
 *
 * Ordering puts right rows BEFORE left rows at equal timestamps, so a
 * right version effective exactly at `t` is visible to a left row at `t`
 * (the `<=` convention, matching DuckDB's `ON l.t >= r.t`).
 */
object AsOfJoin {

  /** The time type both sides are compared in: the FINER of the two when
    * the widening is lossless (date -> timestamp, narrow -> wide integer),
    * and an error otherwise. The old behavior — silently casting the left
    * time to the right side's type — TRUNCATED timestamp left events when
    * the right side was a date, changing `<=` outcomes with no warning. */
  private[operators] def commonTimeType(l: DataType, r: DataType): DataType = {
    val intRank: Map[DataType, Int] =
      Map(ByteType -> 1, ShortType -> 2, IntegerType -> 3, LongType -> 4)
    (l, r) match {
      case (a, b) if a == b => a
      case (DateType, t @ (TimestampType | TimestampNTZType)) => t
      case (t @ (TimestampType | TimestampNTZType), DateType) => t
      case (a, b) if intRank.contains(a) && intRank.contains(b) =>
        if (intRank(a) >= intRank(b)) a else b
      case (a, b) => throw new IllegalArgumentException(
        s"as-of time columns have incompatible types ${a.simpleString} vs " +
          s"${b.simpleString}: no lossless common type — comparing them would " +
          "silently truncate one side; cast explicitly to the semantics you want")
    }
  }

  /**
   * @param left          fact side (every row preserved — left join)
   * @param right         versioned side
   * @param keyCols       equi-join keys (same names on both sides)
   * @param leftTimeCol   left event-time column
   * @param rightTimeCol  right effective-time column
   * @param rightValCols  right columns to attach (emitted as `asof_<name>`)
   * @param rightTiebreak extra right ordering for rows sharing
   *                      (key, time) — REQUIRED for determinism there
   */
  def asOfJoin(
      left: DataFrame, right: DataFrame,
      keyCols: Seq[String],
      leftTimeCol: String, rightTimeCol: String,
      rightValCols: Seq[String],
      rightTiebreak: Seq[String] = Nil): DataFrame = {

    val timeType = commonTimeType(
      left.schema(leftTimeCol).dataType, right.schema(rightTimeCol).dataType)
    val leftCols = left.columns.toIndexedSeq
    // key columns already travel as join keys — carrying them again would
    // duplicate names in the unioned frame
    val nonKeyLeft = leftCols.filterNot(keyCols.contains)
    val payload = struct(rightValCols.map(col): _*)

    // common shape: keys ++ __t ++ __side ++ __tie ++ __r ++ left columns
    def tieCols(present: Boolean): Seq[Column] =
      rightTiebreak.zipWithIndex.map { case (c, i) =>
        (if (present) col(c) else lit(null).cast(right.schema(c).dataType))
          .as(s"__tie$i")
      }
    // equi-join semantics: a right version with a NULL key or NULL time
    // can never match (the window form would otherwise group NULL keys
    // together and sort NULL times first, attaching them to everything)
    val matchableRight = right.filter(
      (col(rightTimeCol).isNotNull +: keyCols.map(col(_).isNotNull))
        .reduce(_ && _))
    val r = matchableRight.select(
      keyCols.map(col) ++
        Seq(col(rightTimeCol).cast(timeType).as("__t"), lit(0).as("__side")) ++
        tieCols(present = true) ++
        Seq(payload.as("__r")) ++
        nonKeyLeft.map(c => lit(null).cast(left.schema(c).dataType).as(c)): _*)
    val l = left.select(
      keyCols.map(col) ++
        Seq(col(leftTimeCol).cast(timeType).as("__t"),
          lit(1).as("__side")) ++
        tieCols(present = false) ++
        Seq(lit(null).cast(r.schema("__r").dataType).as("__r")) ++
        nonKeyLeft.map(col): _*)

    val ordering =
      (col("__t").asc_nulls_first +: col("__side").asc +:
        rightTiebreak.indices.map(i => col(s"__tie$i").asc_nulls_first))
    val w = Window.partitionBy(keyCols.map(col): _*).orderBy(ordering: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    r.unionByName(l)
      .withColumn("__asof", last(col("__r"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .select(leftCols.map(col) ++
        rightValCols.map(c => col(s"__asof.$c").as(s"asof_$c")): _*)
  }
}
