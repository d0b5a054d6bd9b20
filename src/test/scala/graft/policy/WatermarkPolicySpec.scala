package graft.policy

import java.time.{Duration, Instant}

import org.scalatest.funsuite.AnyFunSuite

import graft.policy.WatermarkPolicy._

class WatermarkPolicySpec extends AnyFunSuite {

  private val now = Instant.parse("2024-06-01T12:00:00Z")
  private val conf = PolicyConfig(batchCount = 4096, replicationBufferSecs = 180)

  test("case 1: recently shoved and nearly caught up -> skip") {
    val d = decide(
      nms = now.minusSeconds(200), // within 2*buffer (360s)
      lastShovedOn = Some(now.minusSeconds(60)), // within buffer
      lastRowCount = 100, liveRowCount = 100, now = now, conf = conf)
    assert(d.isInstanceOf[Skip])
  }

  test("case 2: large row growth -> bounded step capped at now - buffer") {
    val nms = now.minus(Duration.ofHours(1000))
    val d = decide(nms, None, 0, 4096L * 8 + 1, now, conf)
    d match {
      case Advance(w, _) =>
        assert(w.lo == nms)
        assert(w.hi == nms.plus(Duration.ofHours(336))) // max step, far from ceiling
      case other => fail(s"expected Advance, got $other")
    }
  }

  test("case 2: step capped at replication ceiling when close to now") {
    val nms = now.minus(Duration.ofHours(2))
    val d = decide(nms, None, 0, 4096L * 8 + 1, now, conf)
    d match {
      case Advance(w, _) => assert(w.hi == now.minusSeconds(180))
      case other => fail(s"expected Advance, got $other")
    }
  }

  test("case 3: small growth while far behind -> bounded step") {
    val nms = now.minus(Duration.ofHours(400)) // > 336h behind
    val d = decide(nms, None, 100, 120, now, conf) // rowDiff 20 < batchCount
    d match {
      case Advance(w, _) => assert(w.hi == nms.plus(Duration.ofHours(336)))
      case other => fail(s"expected Advance, got $other")
    }
  }

  test("case 4: nearly caught up -> advance by a third of the gap") {
    val nms = now.minusSeconds(300) // within 2*buffer, not recently shoved
    val d = decide(nms, Some(now.minusSeconds(10000)), 100, 4200, now, conf)
    d match {
      case Advance(w, _) => assert(w.hi == nms.plusSeconds(100))
      case other => fail(s"expected Advance, got $other")
    }
  }

  test("default: jump to now - buffer") {
    val nms = now.minus(Duration.ofHours(10)) // mid-range behind, mid growth
    val d = decide(nms, None, 100, 4200, now, conf)
    d match {
      case Advance(w, _) => assert(w.hi == now.minusSeconds(180))
      case other => fail(s"expected Advance, got $other")
    }
  }

  test("watermark at ceiling -> skip, never a negative window") {
    val nms = now.minusSeconds(180) // exactly at ceiling
    val d = decide(nms, None, 100, 4200, now, conf)
    d match {
      case Advance(w, _) => assert(w.hi.isAfter(w.lo))
      case _: Skip => succeed
    }
  }

  test("windows from successive ticks are contiguous (lo == previous hi)") {
    var nms = now.minus(Duration.ofHours(1000))
    var clock = now
    var prevHi: Option[Instant] = None
    (1 to 10).foreach { _ =>
      decide(nms, None, 0, 100000, clock, conf) match {
        case Advance(w, _) =>
          prevHi.foreach(h => assert(w.lo == h))
          prevHi = Some(w.hi)
          nms = w.hi
        case _: Skip => ()
      }
      clock = clock.plusSeconds(600)
    }
    assert(prevHi.nonEmpty)
  }
}
