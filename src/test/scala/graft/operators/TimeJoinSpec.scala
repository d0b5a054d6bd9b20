package graft.operators

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.util.Util.utcTs

/** Planted-scenario coverage for the time-join operators (as-of + binned
  * range): boundary inclusion, no-match nulls, tie determinism, and the
  * no-duplicates guarantee of bin expansion. */
class TimeJoinSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ts(s: String): Timestamp = utcTs(s)

  test("asOfJoin: picks latest at-or-before per key; null when none; ties break by tiebreak") {
    val left = Seq(
      (1L, ts("2024-01-10 00:00:00"), "a"),  // after v2 -> v2
      (1L, ts("2024-01-05 00:00:00"), "b"),  // exactly at v2 -> v2 (<= bound)
      (1L, ts("2024-01-02 00:00:00"), "c"),  // between v1 and v2 -> v1
      (1L, ts("2023-12-31 00:00:00"), "d"),  // before all -> null
      (2L, ts("2024-01-10 00:00:00"), "e"),  // other key, no versions -> null
      (3L, ts("2024-01-08 00:00:00"), "f")   // tie case below
    ).toDF("k", "t", "tag")
    val right = Seq(
      (1L, ts("2024-01-01 00:00:00"), 100L),
      (1L, ts("2024-01-05 00:00:00"), 200L),
      (3L, ts("2024-01-08 00:00:00"), 300L), // two versions at the SAME time:
      (3L, ts("2024-01-08 00:00:00"), 301L)  // tiebreak picks greatest vid
    ).toDF("k", "vt", "vid")

    val rows = AsOfJoin.asOfJoin(left, right, Seq("k"), "t", "vt",
      rightValCols = Seq("vid"), rightTiebreak = Seq("vid"))
      .select("tag", "asof_vid").as[(String, Option[Long])].collect().toSeq
    // every left row survives EXACTLY once (toMap would hide duplicates)
    assert(rows.length == 6 && rows.map(_._1).distinct.length == 6)
    val out = rows.toMap
    assert(out("a").contains(200L))
    assert(out("b").contains(200L))
    assert(out("c").contains(100L))
    assert(out("d").isEmpty)
    assert(out("e").isEmpty)
    assert(out("f").contains(301L))

    // NULL right time / NULL keys never match (equi-join semantics)
    val withNulls = AsOfJoin.asOfJoin(
      Seq((Some(9L), ts("2024-01-10 00:00:00"), "x"),
        (None: Option[Long], ts("2024-01-10 00:00:00"), "y"))
        .toDF("k", "t", "tag"),
      Seq((Some(9L), None: Option[Timestamp], 900L),
        (None: Option[Long], Some(ts("2024-01-01 00:00:00")), 901L))
        .toDF("k", "vt", "vid"),
      Seq("k"), "t", "vt", rightValCols = Seq("vid"), rightTiebreak = Seq("vid"))
      .select("tag", "asof_vid").as[(String, Option[Long])].collect().toMap
    assert(withNulls("x").isEmpty, "NULL-time version must never attach")
    assert(withNulls("y").isEmpty, "NULL keys never equi-match")
  }

  test("asOfJoin time types: lossless widening only; lossy combinations raise") {
    import java.sql.Date
    // Date right side vs Timestamp left: compared at TIMESTAMP precision
    // (date widens to midnight) — the old behavior truncated the left
    // events to dates instead
    val left = Seq(
      (1L, ts("2024-01-05 12:00:00"), "noon"),   // after v-eff midnight -> v
      (1L, ts("2024-01-04 23:30:00"), "before")  // before it -> null
    ).toDF("k", "t", "tag")
    val right = Seq((1L, Date.valueOf("2024-01-05"), 500L)).toDF("k", "vd", "vid")
    val out = AsOfJoin.asOfJoin(left, right, Seq("k"), "t", "vd",
      rightValCols = Seq("vid"), rightTiebreak = Seq("vid"))
      .select("tag", "asof_vid").as[(String, Option[Long])].collect().toMap
    assert(out("noon").contains(500L))
    assert(out("before").isEmpty)

    // integer times widen to the WIDER side: a long left beyond Int range
    // must not wrap (the old cast-to-right-type overflowed it)
    val bigT = Int.MaxValue.toLong + 5L
    val intRight = Seq((1L, 100, 7L)).toDF("k", "vt", "vid")
    val longLeft = Seq((1L, bigT, "big"), (1L, 50L, "small")).toDF("k", "t", "tag")
    val widened = AsOfJoin.asOfJoin(longLeft, intRight, Seq("k"), "t", "vt",
      rightValCols = Seq("vid"), rightTiebreak = Seq("vid"))
      .select("tag", "asof_vid").as[(String, Option[Long])].collect().toMap
    assert(widened("big").contains(7L), "must not overflow-wrap the long left time")
    assert(widened("small").isEmpty)

    // no lossless common type -> fail fast at plan build, not silent cast
    val strRight = Seq((1L, "2024-01-05", 9L)).toDF("k", "vt", "vid")
    val lossy = intercept[IllegalArgumentException] {
      AsOfJoin.asOfJoin(left, strRight, Seq("k"), "t", "vt",
        rightValCols = Seq("vid"))
    }
    assert(lossy.getMessage.contains("incompatible types"))
  }

  test("pointInIntervalJoin: half-open bounds, no duplicates across bins, empty intervals dropped") {
    val points = Seq(
      (1L, 10L, ts("2024-01-01 00:00:00")),  // == lo -> in
      (1L, 11L, ts("2024-01-01 05:59:59")),  // just inside
      (1L, 12L, ts("2024-01-01 06:00:00")),  // == hi -> out (half-open)
      (1L, 13L, ts("2024-01-03 00:00:00")),  // outside
      (2L, 14L, ts("2024-01-01 01:00:00"))   // wrong key
    ).toDF("k", "pid", "t")
    val intervals = Seq(
      (1L, 77L, ts("2024-01-01 00:00:00"), ts("2024-01-01 06:00:00")),
      // interval spanning MANY bins with a tiny binWidth must still match once
      (1L, 88L, ts("2024-01-01 00:00:00"), ts("2024-01-02 00:00:00")),
      // empty interval: matches nothing (and must not break bin expansion)
      (1L, 99L, ts("2024-01-05 00:00:00"), ts("2024-01-05 00:00:00"))
    ).toDF("k", "iid", "lo", "hi")

    val out = RangeJoin.pointInIntervalJoin(points, intervals, Seq("k"),
      "t", "lo", "hi", binMicros = 3600L * 1000000) // 1h bins, 6h/24h intervals
      .select("iid", "pid").as[(Long, Long)].collect().toSeq
    assert(out.count { case (i, p) => i == 77L } == 2)       // pids 10, 11
    assert(out.filter(_._1 == 77L).map(_._2).toSet == Set(10L, 11L))
    assert(out.filter(_._1 == 88L).map(_._2).toSet == Set(10L, 11L, 12L))
    assert(!out.exists(_._1 == 99L))
    // exactly-once: no (interval, point) pair appears twice
    assert(out.distinct.size == out.size)
  }
}
