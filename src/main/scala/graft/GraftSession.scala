package graft

import org.apache.spark.sql.SparkSession

/**
 * Library entry point: a SparkSession configured the way every graft
 * component expects (UTC session time, AQE on, right-sized shuffle
 * parallelism) with the custom SQL functions registered.
 *
 * A user of the reference tool switches by calling
 * `GraftSession.create()` and driving `engine.CdcEngine` /
 * `streaming.CdcStream` / the `extensions` operators from it.
 */
object GraftSession {

  def builder(
      appName: String = "graft",
      master: String = s"local[${Runtime.getRuntime.availableProcessors()}]",
      shufflePartitions: Int = Runtime.getRuntime.availableProcessors()): SparkSession.Builder =
    SparkSession.builder()
      .master(master)
      .appName(appName)
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      // harness parquet stores TIMESTAMP(NANOS); see sources.Tables
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // the engine's SQL surface (graft_* functions) — the production
      // `--conf spark.sql.extensions=` shape, wired by default
      .config("spark.sql.extensions", "graft.GraftSqlExtensions")

  def create(appName: String = "graft"): SparkSession = {
    val spark = builder(appName).getOrCreate()
    functions.HashExpressions.register(spark)
    functions.TextExpressions.register(spark)
    // getOrCreate may have returned a PRE-EXISTING session, whose
    // extensions were fixed at its creation — register the same
    // function table directly so graft_* works either way
    GraftSqlExtensions.register(spark)
    spark
  }
}
