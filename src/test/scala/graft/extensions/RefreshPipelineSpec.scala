package graft.extensions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** The end-to-end incremental corpus refresh (corpusDiff → carry/fresh
  * artifacts → decontaminate → curate → leakage-safe split → shard):
  * refresh ≡ rebuild equivalence, the O(changed) carried-row proof, and
  * stage attrition. */
class RefreshPipelineSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def docs = graft.sources.Tables
    .load(spark, TestSpark.Sf0001, "documents")
    .filter(col("doc_id") < 200)
    .select(col("doc_id"), col("text"))

  // the fixture shape of the corpus_refresh_e2e row, shrunk: drop %13,
  // amend %11, add fresh docs for %17, plus a verbatim copy of every
  // 7th new-crawl doc (the exact-dup attrition)
  private def oldCrawl = docs
  private def newCrawl = {
    val base = docs.filter(col("doc_id") % 13 =!= 0)
      .select(col("doc_id"),
        when(col("doc_id") % 11 === 0, concat(col("text"), lit(" amended")))
          .otherwise(col("text")).as("text"))
      .unionByName(docs.filter(col("doc_id") % 17 === 0)
        .select((col("doc_id") + 1000L).as("doc_id"),
          concat(lit("fresh crawl doc "), col("doc_id").cast("string"))
            .as("text")))
    base.unionByName(base.filter(col("doc_id") % 7 === 0)
      .select((col("doc_id") + 5000L).as("doc_id"), col("text")))
  }
  private def evalSet = docs.filter(col("doc_id") % 19 === 0)
    .select(col("text"))

  private def artKey(a: CorpusOps.CrawlArtifacts) = (
    a.metrics.select("doc_id", "lang_pred", "quality", "n_tokens_bpe",
      "fingerprint")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2),
        r.getLong(3), r.getString(4))).toSet,
    a.contaminated.collect().map(_.getLong(0)).toSet)

  test("refreshArtifacts == crawlArtifacts from scratch (refresh ≡ rebuild)") {
    val diff = CorpusOps.corpusDiff(oldCrawl, newCrawl, "doc_id", "text")
    val prior = CorpusOps.crawlArtifacts(oldCrawl, "doc_id", "text", evalSet)
    val refreshed = CorpusOps.refreshArtifacts(prior, newCrawl,
      "doc_id", "text", evalSet, diff)
    val scratch = CorpusOps.crawlArtifacts(newCrawl, "doc_id", "text", evalSet)
    assert(artKey(refreshed) === artKey(scratch))
    // ...and the exports they feed agree row-for-row
    val eRef = CorpusOps.curatedShardExport(refreshed).collect()
      .map(_.toSeq).toSet
    val eScr = CorpusOps.curatedShardExport(scratch).collect()
      .map(_.toSeq).toSet
    assert(eRef === eScr)
  }

  test("carried rows are REUSED, not recomputed: a poisoned prior row " +
    "for an unchanged doc survives into the refreshed artifacts") {
    // doc 1 is unchanged (1 % 13, % 11, % 17 all nonzero). Poison its
    // prior quality to a sentinel no kernel can produce: if the refresh
    // path re-ran the metric battery over unchanged docs, the sentinel
    // would be overwritten — its survival proves the heavy work is
    // O(changed), structurally.
    val diff = CorpusOps.corpusDiff(oldCrawl, newCrawl, "doc_id", "text")
    val prior = CorpusOps.crawlArtifacts(oldCrawl, "doc_id", "text", evalSet)
    val poisoned = prior.copy(metrics = prior.metrics
      .withColumn("quality",
        when(col("doc_id") === 1L, lit(99.0)).otherwise(col("quality"))))
    val refreshed = CorpusOps.refreshArtifacts(poisoned, newCrawl,
      "doc_id", "text", evalSet, diff)
    val q1 = refreshed.metrics.filter(col("doc_id") === 1L)
      .select("quality").collect().map(_.getDouble(0)).toSeq
    assert(q1 === Seq(99.0),
      "an unchanged doc's artifact must be CARRIED from the prior run")
    // while a CHANGED doc (11 % 11 == 0 -> amended) is recomputed fresh:
    // its quality must equal the from-scratch value even under a
    // poisoned prior
    val poisonedAll = prior.copy(metrics = prior.metrics
      .withColumn("quality", lit(99.0)))
    val refreshed2 = CorpusOps.refreshArtifacts(poisonedAll, newCrawl,
      "doc_id", "text", evalSet, diff)
    val scratch = CorpusOps.crawlArtifacts(newCrawl, "doc_id", "text", evalSet)
    val qChangedRef = refreshed2.metrics.filter(col("doc_id") === 11L)
      .select("quality").collect().map(_.getDouble(0)).toSeq
    val qChangedScr = scratch.metrics.filter(col("doc_id") === 11L)
      .select("quality").collect().map(_.getDouble(0)).toSeq
    assert(qChangedRef === qChangedScr && qChangedRef != Seq(99.0),
      "a changed doc must be recomputed from the new crawl's text")
  }

  test("stage attrition: removed, contaminated and duplicate docs are " +
    "absent from the export; copies never straddle the keep decision") {
    val diff = CorpusOps.corpusDiff(oldCrawl, newCrawl, "doc_id", "text")
    val prior = CorpusOps.crawlArtifacts(oldCrawl, "doc_id", "text", evalSet)
    val art = CorpusOps.refreshArtifacts(prior, newCrawl,
      "doc_id", "text", evalSet, diff)
    val export = CorpusOps.curatedShardExport(art)
    val keptIds = export.select("doc_id").collect().map(_.getLong(0)).toSet
    // removed docs (%13) are gone
    assert(keptIds.forall(id => id % 13 != 0 || id >= 1000L))
    // contaminated docs: every unchanged doc quoted in the eval battery
    // (%19, not removed, not amended) must be dropped
    val contaminated = (0L until 200L)
      .filter(id => id % 19 == 0 && id % 13 != 0 && id % 11 != 0)
    assert(contaminated.forall(id => !keptIds.contains(id)),
      s"eval-quoted docs must drop, kept: ${contaminated.filter(keptIds)}")
    // planted copies (+5000) never survive next to their original: the
    // keep-first dedup keeps the min id, which is always the original
    assert(keptIds.forall(_ < 5000L),
      "a verbatim copy must lose keep-first dedup to its original")
    // shards are in range and the split column is the 3-way partition
    val shards = export.select("shard").distinct()
      .collect().map(_.getLong(0)).toSet
    assert(shards.subsetOf((0L until 8L).toSet))
    val splits = export.select("split").distinct()
      .collect().map(_.getString(0)).toSet
    assert(splits.subsetOf(Set("train", "val", "test")))
  }
}
