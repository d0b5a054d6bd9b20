package graft.sinks

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.schema.TypeMapper
import graft.util.Util.utcTs

class AppendSinkSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def batch(ids: Seq[Long]) =
    ids.map(i => (i, s"name_$i")).toDF("id", "name")
      .withColumn("snapshot_tm", lit(utcTs("2024-02-01 00:00:00")))

  test("strict append rejects schema mismatch; accepts exact match") {
    val dir = TestSpark.tmpDir("graft-sink-strict")
    val b = batch(Seq(1L, 2L))
    AppendSink.appendSnapshot(b, dir, "t", expected = Some(b.schema))
    intercept[IllegalArgumentException] {
      AppendSink.appendSnapshot(
        b.withColumn("extra", lit(1)), dir, "t", expected = Some(b.schema))
    }
    assert(AppendSink.readLog(spark, dir, "t").count() == 2)
  }

  test("additive schema evolution: old batches null-fill the new column") {
    val dir = TestSpark.tmpDir("graft-sink-evolve")
    val v1 = batch(Seq(1L, 2L))
    AppendSink.appendEvolved(v1, dir, "t")
    val v2 = batch(Seq(3L)).withColumn("added", lit("x"))
    // drift detection sees the additive change
    val d = TypeMapper.drift(v1.schema, v2.schema)
    assert(d.added.map(_.name) == Seq("added") && d.removed.isEmpty)
    AppendSink.appendEvolved(v2, dir, "t")

    val log = AppendSink.readLog(spark, dir, "t")
    assert(log.columns.contains("added"))
    assert(log.count() == 3)
    assert(log.filter(col("added").isNull).count() == 2) // v1 rows null-filled
    assert(log.filter(col("added") === "x").count() == 1)
  }

  test("T8 batch-bytes cap rolls output files; uncapped appends stay whole") {
    val big = batch(1L to 2000L)
    def files(dir: String): Int = {
      def walk(f: java.io.File): Seq[java.io.File] =
        if (f.isDirectory) f.listFiles().toSeq.flatMap(walk) else Seq(f)
      walk(new java.io.File(dir)).count(_.getName.endsWith(".parquet"))
    }
    val capped = TestSpark.tmpDir("graft-sink-capped")
    val rowBytes = big.schema.defaultSize
    // budget ~100 rows per file -> a 2000-row batch must roll into many files
    AppendSink.appendSnapshot(big.coalesce(1), capped, "t",
      maxFileBytes = Some(100L * rowBytes))
    assert(files(s"$capped/t_cdc") >= 10,
      s"expected rolled files, got ${files(s"$capped/t_cdc")}")

    val uncapped = TestSpark.tmpDir("graft-sink-uncapped")
    AppendSink.appendSnapshot(big.coalesce(1), uncapped, "t")
    assert(files(s"$uncapped/t_cdc") == 1)
    // identical contents either way
    val a = spark.read.parquet(s"$capped/t_cdc")
    val b = spark.read.parquet(s"$uncapped/t_cdc")
    assert(a.except(b).isEmpty && b.except(a).isEmpty)
  }

  test("json-lines sink writes append-only") {
    val dir = TestSpark.tmpDir("graft-sink-json")
    AppendSink.appendJsonLines(batch(Seq(1L)), dir, "t")
    AppendSink.appendJsonLines(batch(Seq(2L)), dir, "t")
    assert(spark.read.json(s"$dir/t_cdc_json").count() == 2)
  }

  test("S9: schema-first JSON-lines load roundtrips types exactly") {
    val dir = TestSpark.tmpDir("graft-sink-json-rt")
    // realistic mixed schema incl. timestamps and doubles
    val events = graft.sources.Tables.load(spark, TestSpark.Sf0001, "events")
      .withColumn("snapshot_tm", lit(utcTs("2024-02-01 00:00:00")))
    AppendSink.appendJsonLines(events, dir, "events")
    val back = AppendSink.readJsonLines(spark, dir, "events", events.schema)
    // JSON loads are always nullable; names/types/order must match exactly
    assert(back.schema.fields.map(f => (f.name, f.dataType)).toSeq ==
      events.schema.fields.map(f => (f.name, f.dataType)).toSeq)
    assert(back.count() == events.count())
    assert(back.except(events).isEmpty && events.except(back).isEmpty)
  }
}
