package graft.extensions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Line-level boilerplate removal: per-source census, stats, scrub,
  * threading-stamp refusal. */
class BoilerplateSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // srcA docs 1-3 share a nav line (>= minDocs=3 -> boilerplate in A);
  // srcB doc 4 carries the SAME line once (kept in B: census is
  // per-source); doc 5 is nav-only (scrubs to empty); doc 6 has blank
  // and padded lines (trim + drop-empty semantics)
  private val nav = "nav home about contact"
  private lazy val corpus = Seq(
    (1L, "srcA", s"$nav\nalpha beta gamma"),
    (2L, "srcA", s"$nav\ndelta epsilon"),
    (3L, "srcA", s"zeta eta\n$nav"),
    (4L, "srcB", s"$nav\ntheta iota"),
    (5L, "srcA", nav),
    (6L, "srcB", "  padded line  \n\n   \nplain line")
  ).toDF("doc_id", "source", "text")

  test("census is per-source: flagged in srcA only, counts exact") {
    val census = Dedup.boilerplateLines(corpus, "doc_id", "text", "source",
      minDocs = 3).collect()
    assert(census.length === 1)
    val r = census.head
    assert(r.getAs[String]("source") === "srcA")
    assert(r.getAs[String]("line") === nav)
    assert(r.getAs[Long]("n_docs") === 4L)
    assert(r.getAs[Long]("n_occ") === 4L)
  }

  test("scrub removes flagged lines in-source only, preserves order, " +
    "empties a nav-only doc") {
    val out = Dedup.scrubBoilerplate(corpus, "doc_id", "text", "source",
      minDocs = 3)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[String]("cleaned"), r.getAs[Long]("n_lines"),
          r.getAs[Long]("n_kept"))).toMap
    assert(out(1L) === (("alpha beta gamma", 2L, 1L)))
    assert(out(3L) === (("zeta eta", 2L, 1L)))
    // same line in srcB is NOT boilerplate there
    assert(out(4L) === ((s"$nav\ntheta iota", 2L, 2L)))
    // fully-boilerplate doc scrubs to the empty string, not NULL
    assert(out(5L) === (("", 1L, 0L)))
    // blank/whitespace-only lines are dropped, padded lines trimmed
    assert(out(6L) === (("padded line\nplain line", 2L, 2L)))
  }

  test("stats: volumes, distinct lines and scrub fraction per source") {
    val st = Dedup.boilerplateStats(corpus, "doc_id", "text", "source",
      minDocs = 3)
      .collect().map(r => r.getAs[String]("source") ->
        (r.getAs[Long]("n_line_occ"), r.getAs[Long]("n_distinct_lines"),
          r.getAs[Long]("n_boiler_lines"), r.getAs[Long]("boiler_occ"),
          r.getAs[Double]("boiler_frac"))).toMap
    // srcA: 7 non-empty line occurrences, 4 distinct, nav flagged (4 occ)
    assert(st("srcA") === ((7L, 4L, 1L, 4L, 4.0 / 7.0)))
    // srcB: nav(1) + theta iota + padded + plain = 4 occ, none flagged
    assert(st("srcB") === ((4L, 4L, 0L, 0L, 0.0)))
  }

  test("threaded lines relation gives identical answers") {
    val lines = Dedup.lineRelation(corpus, "doc_id", "text", "source")
    val direct = Dedup.scrubBoilerplate(corpus, "doc_id", "text", "source",
      minDocs = 3).collect().toSet
    val threaded = Dedup.scrubBoilerplate(corpus, "doc_id", "text", "source",
      minDocs = 3, lines = Some(lines)).collect().toSet
    assert(direct === threaded)
  }

  test("stamp contract: mismatched or hand-rolled relations are refused") {
    val other = corpus.withColumnRenamed("source", "site")
    val wrongSrc = Dedup.lineRelation(other, "doc_id", "text", "site")
      .withColumnRenamed("site", "source")
    val eMismatch = intercept[IllegalArgumentException] {
      Dedup.boilerplateLines(corpus, "doc_id", "text", "source",
        minDocs = 3, lines = Some(wrongSrc))
    }
    assert(eMismatch.getMessage.contains("mis-group"))
    // a hand-rolled explode without the stamp is refused outright
    val bare = corpus.select(col("doc_id"), col("source"),
      posexplode(split(col("text"), "\n")).as(Seq("line_no", "line")))
      .withColumn("line_hash", md5(col("line").cast("binary")))
    val eBare = intercept[IllegalArgumentException] {
      Dedup.scrubBoilerplate(corpus, "doc_id", "text", "source",
        minDocs = 3, lines = Some(bare))
    }
    assert(eBare.getMessage.contains("stamp"))
    // textCol is part of the stamp too (ADVICE r15): a lines relation
    // built over a DIFFERENT text column — e.g. an already-scrubbed one
    // — must be refused, or the census silently reads the wrong text
    val scrubbed = corpus.withColumn("text2", col("text"))
    val wrongText = Dedup.lineRelation(scrubbed, "doc_id", "text2", "source")
    val eText = intercept[IllegalArgumentException] {
      Dedup.boilerplateLines(scrubbed, "doc_id", "text", "source",
        minDocs = 3, lines = Some(wrongText))
    }
    assert(eText.getMessage.contains("textCol=text2"))
  }

  test("null and empty texts yield zero lines and an empty scrub") {
    val withNull = corpus.union(
      Seq((7L, "srcB", null.asInstanceOf[String]), (8L, "srcA", ""))
        .toDF("doc_id", "source", "text"))
    val out = Dedup.scrubBoilerplate(withNull, "doc_id", "text", "source",
      minDocs = 3)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[String]("cleaned"), r.getAs[Long]("n_lines"),
          r.getAs[Long]("n_kept"))).toMap
    assert(out(7L) === (("", 0L, 0L)))
    assert(out(8L) === (("", 0L, 0L)))
  }
}
