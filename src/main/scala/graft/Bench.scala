package graft

import org.apache.spark.sql.SparkSession

/**
 * Benchmark main: times every SparkEntry query end-to-end (plan + execute
 * via count) on SPARK_GRAFT_SF_DIR and emits ONE JSON line:
 * {"metric":"total","value":N,"unit":"sec","queries":{...},"sf":"..."}.
 *
 * Queries run in FAMILY PHASES (relational -> cdc -> text/multimodal ->
 * dedup -> sim), alphabetical within a phase, and each phase's session
 * caches are released the moment its last row finishes. The dedup family
 * pins ~10 persisted relations and the cdc family a live engine +
 * compacted fixture; holding all of it for the whole run (the round-7
 * regime) put every later query under executor-storage pressure and
 * degraded untouched relational rows 3-6x — exactly the cross-tenant
 * memory-pressure failure a shared 100 TB cluster hits. Scoped release
 * is the contract a long-lived service must follow too: drop a corpus
 * version's caches when its last consumer finishes, not at shutdown.
 */
object Bench {

  /** Family phases: (name, membership, post-phase cache release). Order:
    * the cache-free relational rows run on a clean JVM first; cdc (live
    * engine + compacted fixture) runs second and releases its caches
    * before the cache-free text/multimodal rows; then the heavy
    * cache-pinning dedup and sim families, each released before the
    * next starts. Within a phase rows run alphabetically —
    * the fit/probe orderings (dedup_exact_pairs_build before the gates,
    * dedup_incr_index_build before dedup_incremental) are all
    * within-family and survive. BenchPhaseSpec asserts every query name
    * matches exactly one phase, so a new family cannot silently run in
    * the leftover slot under another family's cache pressure. */
  private[graft] val phases: Seq[(String, String => Boolean, () => Unit)] = Seq(
    ("relational", n => n == "q1_agg" || n.startsWith("q_"), () => ()),
    ("cdc", n => n.startsWith("cdc_"),
      () => graft.queries.CdcQueries.clearCaches()),
    ("text", n => n.startsWith("text_") || n.startsWith("multimodal_") ||
      n == "embeddings_stats", () => ()),
    ("dedup", n => n.startsWith("dedup_"),
      () => graft.queries.NorthStarQueries.clearDedupCaches()),
    ("sim", n => n.startsWith("sim_"),
      () => graft.queries.NorthStarQueries.clearSimCaches()))

  /** 1-minute load average from /proc/loadavg (-1 if unreadable) — ambient
    * load is part of the artifact: same-code full runs measured a 45%
    * warm-total swing between an idle and a loaded machine (round 9), so
    * a bench number without its load context cannot be compared across
    * rounds. The archive convention: record >= 3 runs, archive the
    * best-load one, and treat any run with load_start > ~8 (a quarter of
    * the 32 cores already busy) as environment, not code. */
  private def loadAvg1(): Double =
    try scala.io.Source.fromFile("/proc/loadavg").mkString
      .split("\\s+").head.toDouble
    catch { case _: Throwable => -1.0 }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-bench")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val loadStart = loadAvg1()

    // warm the JIT + file-listing caches once so per-query numbers measure
    // the queries, not first-touch JVM costs.
    graft.sources.Tables.all.foreach { t =>
      graft.sources.Tables.load(spark, sfDir, t).count()
    }

    val allNames = SparkEntry.queries.keys.toSeq.sorted
    val phased = phases.map { case (p, member, release) =>
      (p, allNames.filter(member), release)
    }
    // a query family the phase table doesn't know yet must not silently
    // run under another family's cache pressure — run leftovers last,
    // after every scoped release.
    val leftovers = allNames.filterNot(n => phases.exists(_._2(n)))

    // Four timed executions per query: the first ("cold") includes codegen
    // compilation + JIT warmup; then THREE warm reps, reported as their
    // per-query MEDIAN — same-code full runs spanned ~20% (37.9-46.1 s
    // warm at r8), and with a 2x bar that noise band decides pass/fail,
    // so a single warm sample is not an artifact-grade number. The rep
    // min/max ride along in the full artifact as the spread.
    def run(names: Seq[String]): Seq[(String, Double, Seq[Double])] =
      names.map { name =>
        val fn = SparkEntry.queries(name)
        def once(): Double = {
          val t0 = System.nanoTime()
          // toRdd.count(): execute the query's OWN plan — a plain .count()
          // lets the optimizer prune every projected column, so projection
          // queries would be timed as bare scans
          try { fn(spark, sfDir).queryExecution.toRdd.count() }
          catch { case e: Throwable => System.err.println(s"[bench] $name: ${e.getMessage}") }
          (System.nanoTime() - t0) / 1e9
        }
        val cold = once()
        val warms = Seq(once(), once(), once())
        (name, cold, warms)
      }

    val results = (phased.flatMap { case (_, names, release) =>
      val rs = run(names)
      release()
      rs
    } ++ run(leftovers)).sortBy(_._1)

    def median(xs: Seq[Double]): Double = xs.sorted.apply(xs.size / 2)
    def render(xs: Seq[(String, Double)]) =
      xs.map { case (k, v) => "\"" + k + f"\":$v%.3f" }.mkString("{", ",", "}")
    val warmQs = render(results.map(r => (r._1, median(r._3))))
    val coldQs = render(results.map(r => (r._1, r._2)))
    val warmMinQs = render(results.map(r => (r._1, r._3.min)))
    val warmMaxQs = render(results.map(r => (r._1, r._3.max)))
    val warmTotal = results.map(r => median(r._3)).sum
    val coldTotal = results.map(_._2).sum
    // The full artifact (~3 KB with 70+ queries) exceeds the harness's line
    // capture, which truncated it to unparseable JSON in past runs. The
    // harness tail-captures stdout, so the short self-contained totals line
    // must be the LAST line printed (the 4 KB detail line would otherwise
    // push it out of the capture window); the complete artifact also lands
    // in BENCH.json.
    val loadEnd = loadAvg1()
    val loads = f""""load_start":$loadStart%.2f,"load_end":$loadEnd%.2f"""
    val totals =
      f"""{"metric":"total","value":$warmTotal%.3f,"unit":"sec","value_cold":$coldTotal%.3f,$loads,"sf":"$sfDir"}"""
    val full =
      f"""{"metric":"total","value":$warmTotal%.3f,"unit":"sec","value_cold":$coldTotal%.3f,$loads,"sf":"$sfDir","queries":$warmQs,"queries_cold":$coldQs,"queries_warm_min":$warmMinQs,"queries_warm_max":$warmMaxQs}"""
    println(full)
    println(totals)
    val out = new java.io.PrintWriter("BENCH.json")
    try out.println(full) finally out.close()
    // ...and append to the tracked history so the per-round WARM map
    // survives the driver's tail-truncated BENCH_r{N}.json archive — the
    // round-7 audit could not diff warm per-query numbers because only
    // the overwritten BENCH.json carried them.
    val hist = new java.io.FileWriter("BENCH_HISTORY.jsonl", true)
    try hist.write(
      "{\"ts\":" + System.currentTimeMillis / 1000 + "," + full.stripPrefix("{") + "\n")
    finally hist.close()
    // final sweep for anything the phases didn't scope
    SparkEntry.clearCaches()
    spark.stop()
  }
}
