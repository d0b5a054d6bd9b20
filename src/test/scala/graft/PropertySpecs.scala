package graft

import java.time.{Duration, Instant}

import org.scalacheck.{Gen, Prop, Properties}
import org.scalacheck.Prop.forAll

import graft.policy.WatermarkPolicy
import graft.policy.WatermarkPolicy.{Advance, PolicyConfig, Skip}
import graft.schema.{SourceColumn, TypeMapper}

/** ScalaCheck properties (SURVEY §5.2): watermark-policy invariants and
  * type-mapping totality. Pure logic — no SparkSession needed. */
object WatermarkPolicyProps extends Properties("WatermarkPolicy") {

  private val conf = PolicyConfig(batchCount = 4096, replicationBufferSecs = 180)
  private val base = Instant.parse("2024-06-01T12:00:00Z")

  private val genState = for {
    behindSecs <- Gen.choose(0L, 3600L * 24 * 60)
    shovedAgo <- Gen.option(Gen.choose(0L, 3600L * 24))
    lastCount <- Gen.choose(0L, 1000000L)
    diff <- Gen.choose(-100000L, 1000000L)
  } yield (base.minusSeconds(behindSecs), shovedAgo.map(base.minusSeconds),
    lastCount, lastCount + diff)

  property("window never passes the replication ceiling, lo is the watermark") =
    forAll(genState) { case (nms, shoved, last, live) =>
      WatermarkPolicy.decide(nms, shoved, last, live, base, conf) match {
        case Advance(w, _) =>
          w.lo == nms &&
            !w.hi.isAfter(base.minusSeconds(conf.replicationBufferSecs)) &&
            w.hi.isAfter(w.lo)
        case _: Skip => true
      }
    }

  property("bounded-step cases respect the max step (the default jump is unbounded by design, cdc.go:92-95)") =
    forAll(genState) { case (nms, shoved, last, live) =>
      val rowDiff = live - last
      val boundedCase = rowDiff > conf.batchCount * 8 ||
        (rowDiff < conf.batchCount &&
          Duration.between(nms, base).compareTo(conf.maxStep) > 0)
      WatermarkPolicy.decide(nms, shoved, last, live, base, conf) match {
        case Advance(w, _) if boundedCase =>
          Duration.between(w.lo, w.hi).compareTo(conf.maxStep) <= 0
        case _ => true
      }
    }

  property("successive windows are contiguous and monotone (no gap, no overlap)") =
    forAll(Gen.choose(1L, 3600L * 24 * 30), Gen.choose(1, 20)) { (behind, ticks) =>
      var nms = base.minusSeconds(behind)
      var clock = base
      var ok = true
      var prevHi: Option[Instant] = None
      (1 to ticks).foreach { _ =>
        WatermarkPolicy.decide(nms, None, 0, 100000, clock, conf) match {
          case Advance(w, _) =>
            ok &&= prevHi.forall(_ == w.lo) && w.hi.isAfter(w.lo)
            prevHi = Some(w.hi)
            nms = w.hi
          case _: Skip => ()
        }
        clock = clock.plusSeconds(600)
      }
      ok
    }
}

object TypeMapperProps extends Properties("TypeMapper") {

  private val genUdt = Gen.oneOf(
    Gen.alphaNumStr,
    Gen.oneOf("int2", "int4", "int8", "float4", "float8", "numeric", "bool",
      "bytea", "date", "timestamp", "timestamptz", "json", "jsonb", "text"),
    Gen.alphaNumStr.map("_" + _),
    Gen.alphaNumStr.map(_ + "vector"))

  property("total: every udt maps to some Spark type without throwing") =
    forAll(genUdt) { udt =>
      TypeMapper.toSparkType(SourceColumn("c", udt)) != null
    }

  property("arrays map to ArrayType; JSON round-trip is identity") =
    forAll(Gen.alphaNumStr.suchThat(_.nonEmpty)) { s =>
      import org.apache.spark.sql.types._
      val arr = TypeMapper.toSparkType(SourceColumn("c", "_" + s))
      val st = TypeMapper.toStructType(Seq(
        SourceColumn("a", s, ordinalPosition = 1),
        SourceColumn("b", "_" + s, ordinalPosition = 2)))
      arr.isInstanceOf[ArrayType] &&
        TypeMapper.schemaFromJson(TypeMapper.schemaToJson(st)) == st
    }

  property("drift(x, x) is empty; added columns are detected") =
    forAll(Gen.nonEmptyListOf(Gen.identifier).map(_.distinct)) { names =>
      val cols = names.zipWithIndex.map { case (n, i) =>
        SourceColumn(n, "text", ordinalPosition = i) }
      val st = TypeMapper.toStructType(cols)
      val wider = TypeMapper.toStructType(
        cols :+ SourceColumn("zz_new", "int8", ordinalPosition = cols.size))
      TypeMapper.drift(st, st).isEmpty &&
        (names.contains("zz_new") ||
          TypeMapper.drift(st, wider).added.map(_.name) == Seq("zz_new"))
    }
}

object HashProps extends Properties("HashExpressions") {
  import graft.functions.HashExpressions

  property("permutation multipliers are odd 31-bit, deterministic") =
    forAll(Gen.choose(0, 4096)) { i =>
      val (a1, b1) = HashExpressions.permCoeffs(i)
      val (a2, _) = HashExpressions.permCoeffs(i)
      a1 == a2 && (a1 & 1L) == 1L && a1 > 0 && a1 <= 0x7FFFFFFFL && b1 >= 0
    }
}
