package graft

import java.sql.DriverManager

import scala.collection.mutable.ListBuffer

import org.scalatest.funsuite.AnyFunSuite

/** Bans oracle result types whose wire rendering diverges between hash
  * checkers. DuckDB widens `sum(INTEGER/BIGINT)` to HUGEINT (int128);
  * Spark has no int128, so a HUGEINT column in an oracle's result
  * schema can never hash-match the Spark dump byte-for-byte on every
  * checker — the exact failure that cost `text_pack` and
  * `text_pipeline_full` their round-9 green rows despite cell-identical
  * values. This spec runs every entry of [[SparkEntry.oracleSql]]
  * through `DESCRIBE` on the SAME DuckDB version the correctness driver
  * embeds (1.0.0, test-classpath jar) and fails on any int128 column,
  * making the whole trap class unrepresentable: an un-cast widening
  * sum breaks the build here, not the round's correctness artifact. */
class OracleTypesSpec extends AnyFunSuite {

  test("no oracle result schema contains a HUGEINT (int128) column") {
    Class.forName("org.duckdb.DuckDBDriver")
    val conn = DriverManager.getConnection("jdbc:duckdb:")
    try {
      val st = conn.createStatement()
      new java.io.File(TestSpark.Sf0001).listFiles()
        .filter(_.getName.endsWith(".parquet")).foreach { f =>
          val t = f.getName.stripSuffix(".parquet")
          st.execute(
            s"CREATE VIEW $t AS SELECT * FROM read_parquet('${f.getAbsolutePath}')")
        }
      var checked = 0
      val offenders = ListBuffer.empty[String]
      SparkEntry.oracleSql.toSeq.sortBy(_._1).foreach { case (name, sql) =>
        // DESCRIBE binds + types the query without executing it, so the
        // sweep stays cheap even over the recursive-CTE oracles
        val rs = st.executeQuery(s"DESCRIBE $sql")
        while (rs.next()) {
          val tpe = rs.getString("column_type")
          // HUGEINT and UHUGEINT, top-level or nested in a LIST/STRUCT
          if (tpe.contains("HUGEINT"))
            offenders += s"$name.${rs.getString("column_name")}: $tpe"
        }
        checked += 1
      }
      assert(checked == SparkEntry.oracleSql.size && checked > 0,
        "the sweep must DESCRIBE every declared oracle")
      assert(offenders.isEmpty,
        s"int128 oracle columns (CAST them AS BIGINT): ${offenders.mkString(", ")}")
    } finally conn.close()
  }
}
