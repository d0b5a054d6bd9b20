package graft.extensions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Substring-window (span-level) dedup: census, per-doc stats, scrub. */
class WindowDedupSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // a and b share the 8-token boilerplate prefix; c is fully unique;
  // d is shorter than one window; e duplicates a ENTIRELY (every one of
  // its windows is shared)
  private val boiler = "all rights reserved contact the site admin team"
  private lazy val corpus = Seq(
    (1L, s"$boiler unique alpha beta gamma delta content one"),
    (2L, s"$boiler other epsilon zeta eta theta content two"),
    (3L, "completely original prose with no shared spans at all kappa"),
    (4L, "too short for windows"),
    (5L, s"$boiler unique alpha beta gamma delta content one")
  ).toDF("doc_id", "text")

  test("census finds the shared boilerplate window and only cross-doc shares") {
    val dup = Dedup.duplicatedWindows(corpus, "doc_id", "text", n = 8, minDocs = 2)
      .collect()
    assert(dup.nonEmpty, "the boilerplate prefix must surface")
    // every census row really is cross-document
    assert(dup.forall(_.getAs[Long]("n_docs") >= 2))
    // docs 1 and 5 are identical, so at least one window spans 3 docs
    // (1, 2, 5 share the boilerplate window)
    assert(dup.exists(_.getAs[Long]("n_docs") == 3L))
    assert(dup.forall(_.getAs[Long]("n_occ") >= 2L))
  }

  test("short docs produce no windows (descending-sequence guard)") {
    val wins = corpus.filter($"doc_id" === 4L)
      .select(explode(Dedup.windowHashes(
        graft.functions.TextFunctions.tokens($"text"), 8)))
    assert(wins.count() === 0L)
  }

  test("per-doc stats: identical docs fully duplicated, unique doc at zero") {
    val stats = Dedup.windowDupStats(corpus, "doc_id", "text", n = 8, minDocs = 2)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_windows"), r.getAs[Long]("n_dup_windows"),
          r.getAs[Double]("dup_frac"))).toMap
    assert(stats(3L)._3 === 0.0)
    assert(stats(4L) === ((0L, 0L, 0.0)))
    // docs 1 and 5 are token-identical: every window duplicated
    assert(stats(1L)._3 === 1.0)
    assert(stats(5L)._3 === 1.0)
    // doc 2 shares the prefix but not its tail
    assert(stats(2L)._2 >= 1L && stats(2L)._3 < 1.0)
    // window counts: tokens - n + 1
    assert(stats(1L)._1 === 15L - 8L + 1L)
  }

  test("scrub removes exactly the covered spans; unique prose untouched") {
    val scrubbed = Dedup.scrubDuplicatedWindows(corpus, "doc_id", "text",
        n = 8, minDocs = 2)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[String]("scrubbed"), r.getAs[Long]("n_tokens"),
          r.getAs[Long]("n_kept"))).toMap
    // unique doc: rebuilt text == its own token stream, nothing dropped
    assert(scrubbed(3L)._1 ===
      "completely original prose with no shared spans at all kappa")
    assert(scrubbed(3L)._2 === scrubbed(3L)._3)
    // fully-duplicated docs scrub to the empty string (concat_ws of
    // nothing — the documented DuckDB COALESCE divergence)
    assert(scrubbed(1L)._1 === "" && scrubbed(1L)._3 === 0L)
    assert(scrubbed(5L)._1 === "")
    // the partial doc keeps SOMETHING (its unique tail survives past the
    // last duplicated window's coverage)
    assert(scrubbed(2L)._3 > 0L && scrubbed(2L)._3 < scrubbed(2L)._2)
    // and what survives never contains the boilerplate span
    assert(!scrubbed(2L)._1.contains("rights reserved"))
  }

  test("null/empty text scrubs to an empty doc, never phantom positions") {
    // size(NULL tokens) is -1/NULL, and sequence(1, -1) DESCENDS —
    // before the guarded branch a null doc reported n_kept=3 phantom
    // positions [1, 0, -1] (ADVICE r13)
    val withNull = Seq(
      (20L, null.asInstanceOf[String]),
      (21L, ""),
      (22L, "completely original prose with no shared spans at all kappa")
    ).toDF("doc_id", "text")
    val s = Dedup.scrubDuplicatedWindows(withNull, "doc_id", "text", 8, 2)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[String]("scrubbed"), r.getAs[Long]("n_tokens"),
          r.getAs[Long]("n_kept"))).toMap
    assert(s(20L) === (("", 0L, 0L)))
    assert(s(21L) === (("", 0L, 0L)))
    assert(s(22L)._2 === s(22L)._3 && s(22L)._3 > 0L)
  }

  test("wins threading contract: stamped (n, idCol) enforced, mismatch refused at plan time") {
    val rel = Dedup.windowRelation(corpus, "doc_id", "text", n = 8)
    // matching parameters: same census as the self-derived path
    val viaRel = Dedup.duplicatedWindows(corpus, "doc_id", "text",
      n = 8, minDocs = 2, wins = Some(rel)).collect().map(_.toString).sorted
    val direct = Dedup.duplicatedWindows(corpus, "doc_id", "text",
      n = 8, minDocs = 2).collect().map(_.toString).sorted
    assert(viaRel.sameElements(direct))

    // a wins built with a DIFFERENT n silently mis-joined before the
    // stamp (sequence(win_start+1, win_start+n) expands with the
    // consumer's n) — now it must refuse before any join runs
    val rel4 = Dedup.windowRelation(corpus, "doc_id", "text", n = 4)
    val e1 = intercept[IllegalArgumentException] {
      Dedup.windowDupStats(corpus, "doc_id", "text", n = 8, wins = Some(rel4))
    }
    assert(e1.getMessage.contains("n=4") && e1.getMessage.contains("n=8"))
    val e2 = intercept[IllegalArgumentException] {
      Dedup.scrubDuplicatedWindows(corpus, "doc_id", "text", n = 8,
        wins = Some(rel4))
    }
    assert(e2.getMessage.contains("mis-join"))
    // a different idCol is the same failure class
    val e3 = intercept[IllegalArgumentException] {
      Dedup.duplicatedWindows(corpus.withColumnRenamed("doc_id", "id"),
        "id", "text", n = 8, wins = Some(rel))
    }
    assert(e3.getMessage.contains("idCol=doc_id"))

    // an UNSTAMPED hand-rolled explode is refused outright — only
    // windowRelation's stamp proves the parameters
    val bare = corpus.select(col("doc_id"),
        explode(Dedup.windowHashes(
          graft.functions.TextFunctions.tokens(col("text")), 8)).as("w"))
      .select(col("doc_id"), col("w.win_start").as("win_start"),
        col("w.win_hash").as("win_hash"))
    val e4 = intercept[IllegalArgumentException] {
      Dedup.windowDupStats(corpus, "doc_id", "text", n = 8, wins = Some(bare))
    }
    assert(e4.getMessage.contains("stamp"))
    // and the stamp survives persistence — the realistic threading shape
    val pinned = rel.persist()
    try {
      assert(Dedup.windowDupStats(corpus, "doc_id", "text", n = 8,
        wins = Some(pinned)).count() > 0)
    } finally { pinned.unpersist(false); () }
  }

  test("minDocs=2 means within-doc repetition alone never scrubs") {
    val selfRep = Seq(
      (10L, "spark rows spark rows spark rows spark rows spark rows spark rows spark rows spark rows")
    ).toDF("doc_id", "text")
    assert(Dedup.duplicatedWindows(selfRep, "doc_id", "text", 8, 2).count() === 0L)
    val s = Dedup.scrubDuplicatedWindows(selfRep, "doc_id", "text", 8, 2)
      .head()
    assert(s.getAs[Long]("n_kept") === s.getAs[Long]("n_tokens"))
  }

  test("window explode stages __toks below the Generate (no per-element re-tokenize)") {
    // The windowHashes lambdas reference their toks argument once PER
    // WINDOW; against an inlined tokens(text) expression that re-ran the
    // full regex tokenize O(windows) per doc (the bm25 dl-above-Generate
    // class, r20 fix). Pin the staged shape: the Generate's generator
    // must reference the __toks ATTRIBUTE, computed by a Project beneath
    // it — i.e. exactly ONE split(...) in the whole optimized plan, below
    // the Generate.
    val corpus = Seq((1L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"))
      .toDF("doc_id", "text")
    val plan = Dedup.windowRelation(corpus, "doc_id", "text", n = 8)
      .queryExecution.optimizedPlan
    val generates = plan.collect {
      case g: org.apache.spark.sql.catalyst.plans.logical.Generate => g
    }
    assert(generates.nonEmpty, "window explode must plan as a Generate")
    val gen = generates.head
    // the generator sees only attributes named __toks, never a split()
    val genStr = gen.generator.sql
    assert(!genStr.contains("split("),
      s"tokenize inlined into the generator (re-runs per window): $genStr")
    assert(genStr.contains("__toks"),
      s"generator must read the staged __toks attribute: $genStr")
  }
}
