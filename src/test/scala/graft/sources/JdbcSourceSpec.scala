package graft.sources

import java.time.Instant
import java.util.Properties

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.engine.CdcEngine
import graft.policy.WatermarkPolicy.PolicyConfig

/**
 * End-to-end JDBC integration against embedded Derby (the only database in
 * the container): closes the "production mode designed but never run" gap —
 * the reference's sole source is a live database over the wire
 * (`/root/reference/postgres.go:29-41,105-114`).
 *
 * Seeds Derby from the events parquet, then proves the JDBC capture path
 * (SqlGen windowed SELECT via `spark.read.jdbc`) produces byte-identical
 * CDC logs to the parquet path under the same synthetic clock.
 */
class JdbcSourceSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def derbyProps(): Properties = {
    val p = new Properties()
    p.setProperty("driver", "org.apache.derby.jdbc.EmbeddedDriver")
    p
  }

  /** Create a fresh embedded Derby DB holding the sf0.001 events table. */
  private def seedDerby(): (String, Properties) = {
    val dbDir = TestSpark.tmpDir("graft-derby") + "/db"
    System.setProperty("derby.stream.error.file",
      TestSpark.tmpDir("graft-derby-log") + "/derby.log")
    val url = s"jdbc:derby:$dbDir;create=true"
    val events = Tables.load(spark, TestSpark.Sf0001, "events")
    events.write.jdbc(url, "EVENTS", derbyProps())
    (url, derbyProps())
  }

  test("JDBC capture path == parquet capture path, byte-identical logs") {
    val (url, props) = seedDerby()
    val jdbc = new JdbcSource(spark, url, props, "APP",
      nowExpr = "CURRENT_TIMESTAMP")

    // same source data: full-table read through JDBC equals the parquet load
    val viaJdbc = jdbc.load("EVENTS")
    val viaParquet = Tables.load(spark, TestSpark.Sf0001, "events")
    assert(viaJdbc.count() == 1000L)
    assert(viaJdbc.except(viaParquet).isEmpty && viaParquet.except(viaJdbc).isEmpty)
    assert(jdbc.liveRowCount("EVENTS") == 1000L)

    // engine over JDBC vs engine over parquet, same policy + clock
    def mkEngine(source: Option[SnapshotSource], tag: String) =
      new CdcEngine(spark, TestSpark.Sf0001,
        TestSpark.tmpDir(s"graft-jdbc-sink-$tag"),
        TestSpark.tmpDir(s"graft-jdbc-state-$tag"),
        policy = PolicyConfig(batchCount = 100, replicationBufferSecs = 180),
        concurrency = 1, source = source)

    val engJ = mkEngine(Some(jdbc), "j")
    val engP = mkEngine(None, "p")
    engJ.seed(Seq(("EVENTS", "ts", Some("event_id"))))
    engP.seed(Seq(("events", "ts", Some("event_id"))))

    // identical seed watermarks from both sources
    val nmsJ = engJ.state.readForDsn(1).collect().head.nms
    val nmsP = engP.state.readForDsn(1).collect().head.nms
    assert(nmsJ == nmsP)

    var clock = Instant.parse("2024-02-01T00:00:00Z")
    (1 to 12).foreach { _ =>
      engJ.tick(clock); engP.tick(clock)
      clock = clock.plusSeconds(3600)
    }

    val logJ = engJ.cdcLog("EVENTS")
    val logP = engP.cdcLog("events")
    assert(logJ.count() == logP.count() && logJ.count() > 0)
    // byte-identical: same rows, same snapshot_tm stamps (shared clock)
    assert(logJ.except(logP).isEmpty && logP.except(logJ).isEmpty)
  }

  test("PgSource: per-tick row counts use the stats query, never COUNT(*)") {
    val (url, props) = seedDerby()
    val issued = scala.collection.mutable.ArrayBuffer[String]()
    // Derby stand-in for pg_class (Derby has no planner-stats view): the
    // override mechanism under test is exactly what a production PgSource
    // exercises — liveRowCount must route through statsRowCountQuery.
    def mkPg(statsSql: String) = new PgSource(spark, url, props, "APP") {
      override protected def statsRowCountQuery(table: String): String = statsSql
      override protected def read(q: String) = {
        issued.synchronized { issued += q }; super.read(q)
      }
    }

    val pg = mkPg("SELECT CAST(997 AS DOUBLE) AS est FROM SYSIBM.SYSDUMMY1")
    assert(pg.liveRowCount("EVENTS") == 997L, "estimate, not exact count")

    // full engine loop: seed + ticks must never issue a COUNT(*)
    val eng = new CdcEngine(spark, TestSpark.Sf0001,
      TestSpark.tmpDir("graft-pg-sink"), TestSpark.tmpDir("graft-pg-state"),
      policy = PolicyConfig(batchCount = 100, replicationBufferSecs = 180),
      concurrency = 1, source = Some(pg))
    eng.seed(Seq(("EVENTS", "ts", Some("event_id"))))
    var clock = Instant.parse("2024-02-01T00:00:00Z")
    (1 to 4).foreach { _ => eng.tick(clock); clock = clock.plusSeconds(3600) }
    assert(eng.cdcLog("EVENTS").count() > 0)
    assert(!issued.exists(_.toUpperCase.contains("COUNT(*)")),
      s"COUNT(*) issued: ${issued.filter(_.toUpperCase.contains("COUNT(*)"))}")

    // degenerate stats (reltuples = -1 pre-ANALYZE) fall back to one exact count
    issued.clear()
    val fallback = mkPg("SELECT CAST(-1 AS DOUBLE) AS est FROM SYSIBM.SYSDUMMY1")
    assert(fallback.liveRowCount("EVENTS") == 1000L)
    assert(issued.exists(_.toUpperCase.contains("COUNT(*)")))
  }

  test("SqlGen database-side munging matches Spark-side munging") {
    val (url, props) = seedDerby()
    val jdbc = new JdbcSource(spark, url, props, "APP",
      nowExpr = "CURRENT_TIMESTAMP")
    val lo = graft.util.Util.utcTs("2024-01-05 00:00:00")
    val hi = graft.util.Util.utcTs("2024-01-15 00:00:00")
    val minBound = graft.util.Util.utcTs("2024-01-08 00:00:00")

    // database-side CASE munging (the reference's form, postgres.go:72-101)
    val cols = Seq(
      graft.schema.SourceColumn("event_id", "bigint", ordinalPosition = 1),
      graft.schema.SourceColumn("ts", "timestamp", ordinalPosition = 2))
    val sql = SqlGen.snapshotQuery("APP", "EVENTS", cols, "ts", lo, hi,
      munge = Some(SqlGen.MungeSql(minBound, toNull = false)),
      withSnapshotTm = false, nowExpr = "CURRENT_TIMESTAMP")
    val dbMunged = spark.read.format("jdbc")
      .option("url", url).option("query", sql)
      .option("driver", props.getProperty("driver")).load()

    // Spark-side munging over the same window — but Snapshot never munges
    // the NMS column, so munge a non-NMS copy for an apples-to-apples check
    val sparkMunged = Tables
      .loadWindowed(spark, TestSpark.Sf0001, "events", "ts", lo, hi)
      .select(col("event_id"),
        graft.operators.Snapshot.mungeTimestamp(col("ts"),
          graft.operators.Snapshot.MungeConfig(minBound, toNull = false)).as("ts"))

    assert(dbMunged.count() == sparkMunged.count() && dbMunged.count() > 0)
    assert(dbMunged.except(sparkMunged).isEmpty && sparkMunged.except(dbMunged).isEmpty)
  }
}
