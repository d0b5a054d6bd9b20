package graft.engine

import org.scalatest.funsuite.AnyFunSuite

import graft.util.Util.utcTs

class GraftConfigSpec extends AnyFunSuite {

  test("defaults mirror the reference's operating defaults") {
    val c = GraftConfig()
    assert(c.batchCount == 4096L)       // benthos.go:113-116
    assert(c.batchBytes == 40000000L)   // benthos.go:117-120
    assert(c.batchPeriodSecs == 20L)    // benthos.go:121-124
    assert(c.replicationBufferSecs == 180L)
    assert(c.munge.isEmpty)
  }

  test("env parsing with the reference's variable names") {
    val c = GraftConfig.fromEnv(Map(
      "BQ_BATCH_COUNT" -> "1000",
      "PG_REPLICATION_BUFFER_SECS" -> "60",
      "BENTHOS_CONCURRENT_STREAMS" -> "2",
      "MUNGE_TIMESTAMPS_BEFORE_MIN" -> "true",
      "MUNGE_INVALID_TIMESTAMPS_TO_NULL" -> "true",
      "MUNGE_TIMESTAMPS_MIN" -> "2000-01-01 00:00:00",
      "OUTPUT_TYPE" -> "FILE",
      "BQ_BATCH_BYTES" -> "1048576",
      "BQ_BATCH_PERIOD" -> "5",
      "EXCLUDED_TABLES" -> "audit_log, tmp_scratch"))
    assert(c.batchCount == 1000L && c.replicationBufferSecs == 60L)
    assert(c.concurrentStreams == 2)
    assert(c.jsonLinesOutput)
    assert(c.batchBytes == 1048576L && c.batchPeriodSecs == 5L)
    assert(c.excludedTables == Set("audit_log", "tmp_scratch"))
    val m = c.munge.get
    assert(m.toNull && m.minBound == utcTs("2000-01-01 00:00:00"))
    assert(c.policy.batchCount == 1000L)
  }

  test("munge gate logic follows the generator (postgres.go:72-101)") {
    // BEFORE_EPOCH + TO_MIN only honored when the min is pre-epoch
    val notHonored = GraftConfig(mungeBeforeEpoch = true, mungeToMin = true,
      mungeMin = utcTs("2000-01-01 00:00:00"))
    assert(notHonored.munge.isEmpty)
    val honored = GraftConfig(mungeBeforeEpoch = true, mungeToMin = true,
      mungeMin = utcTs("1960-01-01 00:00:00"))
    assert(honored.munge.exists(m => !m.toNull))
    val epochNull = GraftConfig(mungeBeforeEpoch = true, mungeToNull = true)
    assert(epochNull.munge.exists(_.toNull))
  }
}
