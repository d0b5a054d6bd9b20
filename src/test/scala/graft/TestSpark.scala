package graft

import org.apache.spark.sql.SparkSession

/** One shared local SparkSession for the whole test run. */
object TestSpark {
  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // the production extension-injection path — SqlSurfaceSpec
      // asserts the graft_* functions arrived through THIS, not a
      // post-hoc registration
      .config("spark.sql.extensions", "graft.GraftSqlExtensions")
      // the production CALL-procedure path (maintenance from pure SQL)
      .config("spark.sql.catalog.graft", "graft.GraftProcedureCatalog")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }

  val Sf0001 = "/root/testdata/sf0.001"

  def tmpDir(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString
}
