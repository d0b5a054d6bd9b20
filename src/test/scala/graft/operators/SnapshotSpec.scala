package graft.operators

import java.sql.Timestamp

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.util.Util.utcTs

class SnapshotSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def mkDf(ts: String*) =
    ts.zipWithIndex.map { case (t, i) => (i.toLong, utcTs(t)) }
      .toDF("id", "nms")

  test("half-open window: row at lo excluded, row at hi included") {
    val df = mkDf("2024-01-01 00:00:00", "2024-01-02 00:00:00", "2024-01-03 00:00:00")
    val out = Snapshot.snapshotWindow(df, "nms",
      lo = utcTs("2024-01-01 00:00:00"), hi = utcTs("2024-01-03 00:00:00"),
      snapshotTm = utcTs("2024-02-01 00:00:00"))
    val ids = out.select("id").as[Long].collect().sorted
    assert(ids.toSeq == Seq(1L, 2L)) // id 0 at lo excluded; id 2 at hi included
  }

  test("snapshot_tm is the batch constant") {
    val df = mkDf("2024-01-02 00:00:00")
    val out = Snapshot.snapshotWindow(df, "nms",
      utcTs("2024-01-01 00:00:00"), utcTs("2024-01-03 00:00:00"),
      snapshotTm = utcTs("2024-02-01 00:00:00"))
    assert(out.select("snapshot_tm").as[Timestamp].head() == utcTs("2024-02-01 00:00:00"))
  }

  test("munge to NULL vs clamp to min; NMS column never munged") {
    val df = Seq(
      (1L, utcTs("2024-01-02 00:00:00"), utcTs("1960-01-01 00:00:00")),
      (2L, utcTs("2024-01-02 12:00:00"), utcTs("2024-01-01 00:00:00")),
      (3L, utcTs("2024-01-02 13:00:00"), null.asInstanceOf[Timestamp])
    ).toDF("id", "nms", "updated")
    val lo = utcTs("2024-01-01 00:00:00"); val hi = utcTs("2024-01-03 00:00:00")
    val snap = utcTs("2024-02-01 00:00:00")
    val minB = utcTs("1970-01-01 00:00:00")

    val asNull = Snapshot.snapshotWindow(df, "nms", lo, hi, snap,
      Some(Snapshot.MungeConfig(minB, toNull = true)))
      .select("id", "updated").as[(Long, Option[Timestamp])].collect().toMap
    assert(asNull(1L).isEmpty)              // pre-epoch -> NULL
    assert(asNull(2L).contains(utcTs("2024-01-01 00:00:00"))) // valid kept
    assert(asNull(3L).isEmpty)              // NULL stays NULL

    val clamped = Snapshot.snapshotWindow(df, "nms", lo, hi, snap,
      Some(Snapshot.MungeConfig(minB, toNull = false)))
      .select("id", "updated").as[(Long, Option[Timestamp])].collect().toMap
    assert(clamped(1L).contains(minB))      // clamped up to the bound
    assert(clamped(3L).isEmpty)             // NULL not clamped

    // rows' own nms survived untouched (window filter applied to raw values)
    val nms = Snapshot.snapshotWindow(df, "nms", lo, hi, snap,
      Some(Snapshot.MungeConfig(utcTs("2025-01-01 00:00:00"), toNull = true)))
    assert(nms.count() == 3) // all in window even though munge bound is later
  }

  test("consecutive windows partition the data: no dup, no loss") {
    val df = mkDf((1 to 50).map(i => f"2024-01-${i % 28 + 1}%02d 00:00:01"): _*)
    val snap = utcTs("2024-02-01 00:00:00")
    val all = Snapshot.snapshotWindow(df, "nms",
      utcTs("2023-12-31 00:00:00"), utcTs("2024-02-01 00:00:00"), snap)
    val w1 = Snapshot.snapshotWindow(df, "nms",
      utcTs("2023-12-31 00:00:00"), utcTs("2024-01-10 00:00:00"), snap)
    val w2 = Snapshot.snapshotWindow(df, "nms",
      utcTs("2024-01-10 00:00:00"), utcTs("2024-01-20 00:00:00"), snap)
    val w3 = Snapshot.snapshotWindow(df, "nms",
      utcTs("2024-01-20 00:00:00"), utcTs("2024-02-01 00:00:00"), snap)
    val union = w1.union(w2).union(w3)
    assert(union.count() == all.count())
    assert(union.except(all).isEmpty && all.except(union).isEmpty)
  }
}
