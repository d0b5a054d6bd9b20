package graft.policy

import java.time.{Duration, Instant}

/**
 * Adaptive watermark-advancement policy — the heart of the reference's CDC
 * loop (`/root/reference/cdc.go:61-96`), re-expressed as a pure function so
 * it is unit/property testable and engine-agnostic.
 *
 * Given a table's committed watermark (`nms`), its last-observed and live
 * row counts, and the clock, decide the next half-open capture window
 * `(nms, newNms]` — or skip this tick.
 *
 * Case mapping to the reference:
 *  1. skip: recently shoved AND watermark near now (`cdc.go:67-68`). The
 *     reference compares a nanosecond Duration to a seconds int there (a
 *     latent bug); we implement the evident intent: both gaps measured in
 *     seconds against the replication buffer.
 *  2. large growth (`rowDiff > 8*batchCount`): advance by at most
 *     `maxStep`, capped at `now - buffer` (`cdc.go:69-78`).
 *  3. small growth (`rowDiff < batchCount`) while far behind
 *     (> maxStep behind now): same bounded step (`cdc.go:79-88`).
 *  4. nearly caught up (within `2*buffer` of now): advance by one third of
 *     the remaining gap (`cdc.go:89-91`).
 *  5. otherwise: jump to `now - buffer` (`cdc.go:92-95`).
 *
 * The `now - buffer` ceiling is the replication-lag guard
 * (`PG_REPLICATION_BUFFER_SECS`, `cdc.go:73-77,83-87,93`): never capture
 * rows that a lagging replica might not have yet.
 */
object WatermarkPolicy {

  /** Half-open capture interval `(lo, hi]` (`/root/reference/postgres.go:52-53`). */
  final case class CaptureWindow(lo: Instant, hi: Instant) {
    require(!hi.isBefore(lo), s"window hi $hi before lo $lo")
  }

  final case class PolicyConfig(
      batchCount: Long = 4096L,            // BQ_BATCH_COUNT default, benthos.go:113-116
      replicationBufferSecs: Long = 180L,  // sample.env:7
      maxStep: Duration = Duration.ofHours(336)) // 14 days, cdc.go:70,80

  sealed trait Decision
  final case class Advance(window: CaptureWindow, reason: String) extends Decision
  final case class Skip(reason: String) extends Decision

  def decide(
      nms: Instant,
      lastShovedOn: Option[Instant],
      lastRowCount: Long,
      liveRowCount: Long,
      now: Instant,
      conf: PolicyConfig = PolicyConfig()): Decision = {

    val buffer = Duration.ofSeconds(conf.replicationBufferSecs)
    val ceiling = now.minus(buffer)
    val behind = Duration.between(nms, now)
    val rowDiff = liveRowCount - lastRowCount
    val sinceShove = lastShovedOn.map(t => Duration.between(t, now))

    def bounded(reason: String): Decision = {
      val stepped = nms.plus(conf.maxStep)
      val hi = if (stepped.isBefore(ceiling)) stepped else ceiling
      if (hi.isAfter(nms)) Advance(CaptureWindow(nms, hi), reason)
      else Skip(s"$reason: ceiling $ceiling not past watermark $nms")
    }

    if (sinceShove.exists(_.compareTo(buffer) < 0) &&
        behind.compareTo(buffer.multipliedBy(2)) < 0) {
      Skip("recently shoved and nearly caught up") // case 1
    } else if (rowDiff > conf.batchCount * 8) {
      bounded("large row growth")                  // case 2
    } else if (rowDiff < conf.batchCount && behind.compareTo(conf.maxStep) > 0) {
      bounded("small growth, far behind")          // case 3
    } else if (behind.compareTo(buffer.multipliedBy(2)) < 0) {
      val third = Duration.ofNanos(behind.toNanos / 3)
      val hi = nms.plus(third)
      if (hi.isAfter(nms)) Advance(CaptureWindow(nms, hi), "nearly caught up: third of gap") // case 4
      else Skip("gap too small to advance")
    } else if (ceiling.isAfter(nms)) {
      Advance(CaptureWindow(nms, ceiling), "jump to now - buffer") // else
    } else {
      Skip("watermark already at replication ceiling")
    }
  }
}
