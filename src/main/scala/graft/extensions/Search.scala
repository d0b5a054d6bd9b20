package graft.extensions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/**
 * Keyword retrieval over a document corpus: BM25 scoring and exact
 * phrase search — the lexical complement of the embedding ANN stack in
 * [[Similarity]] (a curation pipeline needs both: "find docs about X"
 * by term statistics when no embedding model is in the loop, and exact
 * phrase lookup for targeted audits).
 *
 * Scale design (100 TB): a QUERY has a handful of terms, so nothing
 * here ever builds a corpus-sized inverted index or explodes tokens —
 * per-document term frequencies for the query's own terms are computed
 * as a narrow codegen'd projection over the token array (one corpus
 * scan), the corpus statistics BM25 needs (N, total token count, one
 * document frequency per query term) reduce to a SINGLE scalar row
 * (integer sums — exact and order-independent, so the result is
 * deterministic across partitionings and engines), and that row joins
 * back by broadcast. Top-k is Spark's TakeOrdered. One scan, one
 * 1-row broadcast, zero shuffles of corpus-sized data.
 */
object Search {

  /** Okapi BM25 per-document scores for a bag-of-words query, one corpus
    * scan. Emits (id, score, dl) for every document matching at least
    * one query term. The score sums per-term contributions in the FIXED
    * order of `terms` (floating-point addition is not associative; a
    * fixed expression order keeps the score reproducible bit-for-bit
    * across runs, partitionings and engines). Terms are matched on the
    * normalized token stream ([[TextFunctions.tokens]]); absent terms
    * contribute zero (their tf is 0 everywhere).
    *
    * idf is the standard "plus one" form ln(1 + (N - df + 0.5)/(df +
    * 0.5)) — non-negative even for terms in more than half the corpus
    * (degenerate-but-real at web scale: stopwords). avgdl is computed
    * from exact integer sums, not a float mean, for the same
    * determinism reason as the score order. */
  def bm25Scores(df: DataFrame, idCol: String, textCol: String,
                 terms: Seq[String], k1: Double = 1.2,
                 b: Double = 0.75): DataFrame = {
    require(terms.nonEmpty, "bm25Scores: empty query")
    require(terms.size <= 64,
      "bm25Scores: the projection kernel is for QUERY-sized term sets " +
        "(<= 64); an analysis over a large vocabulary wants the " +
        "corpus_word_freq inverted-index shape instead")
    val toks = TextFunctions.tokens(col(textCol))
    // one narrow pass: per-doc length + one tf column per query term
    val tfs = df.select(
      col(idCol) +:
        greatest(size(toks), lit(0)).cast("long").as("dl") +:
        terms.zipWithIndex.map { case (t, i) =>
          size(filter(toks, x => x === lit(t))).cast("long").as(s"__tf$i")
        }: _*)
    // corpus stats: ONE scalar row of exact integer sums (N, sum dl,
    // per-term document frequencies) — broadcast back via a 1-row join
    val stats = tfs.agg(
      count(lit(1)).as("__n"),
      sum(col("dl")).as("__sumdl") +:
        terms.indices.map(i =>
          sum(when(col(s"__tf$i") > 0, 1L).otherwise(0L)).as(s"__df$i")): _*)
    val scored = tfs.join(broadcast(stats))
    val avgdl = col("__sumdl").cast("double") / col("__n").cast("double")
    val norm = lit(k1) * (lit(1.0 - b) + lit(b) * col("dl").cast("double") / avgdl)
    // fixed-order sum: term 0 first, term n last — never a float SUM agg
    val score = terms.indices.map { i =>
      val tf = col(s"__tf$i").cast("double")
      val idf = log(lit(1.0) +
        (col("__n").cast("double") - col(s"__df$i") + lit(0.5)) /
          (col(s"__df$i").cast("double") + lit(0.5)))
      idf * tf * lit(k1 + 1.0) / (tf + norm)
    }.reduce(_ + _)
    scored
      .filter(terms.indices.map(i => col(s"__tf$i") > 0).reduce(_ || _))
      .select(col(idCol), score.as("score"), col("dl"))
  }

  /** Top-k BM25: highest-scoring k documents, ties broken by id (fully
    * deterministic). Plans as TakeOrderedAndProject over the one-scan
    * [[bm25Scores]] — each partition keeps k rows, the driver merges
    * per-partition heads; no global sort at any scale. */
  def bm25TopK(df: DataFrame, idCol: String, textCol: String,
               terms: Seq[String], k: Int = 20, k1: Double = 1.2,
               b: Double = 0.75): DataFrame =
    bm25Scores(df, idCol, textCol, terms, k1, b)
      .orderBy(col("score").desc, col(idCol))
      .limit(k)

  /** Exact phrase search on the normalized token stream: documents
    * containing `phrase` (a consecutive token sequence), with the
    * occurrence count. Reuses the span-dedup window kernel
    * ([[Dedup.windowHashes]] is the same sliding-window shape) as a
    * per-row filter — zero shuffles, zero explode: counting matches of
    * one phrase needs no inverted index, just a codegen'd scan. */
  def phraseHits(df: DataFrame, idCol: String, textCol: String,
                 phrase: String): DataFrame = {
    val terms = phrase.trim.split("\\s+").toSeq
    require(terms.nonEmpty && terms.forall(_.nonEmpty),
      "phraseHits: empty phrase")
    val n = terms.size
    val want = terms.mkString(" ")
    val toks = TextFunctions.tokens(col(textCol))
    val hits = size(filter(
      // all n-token windows, as in the span-dedup family — but matched
      // against ONE literal, so the comparison stays inside codegen
      transform(
        filter(sequence(lit(0), greatest(size(toks) - n, lit(0))),
          i => i <= size(toks) - n),
        i => concat_ws(" ", slice(toks, i + 1, lit(n)))),
      w => w === lit(want))).cast("long")
    df.select(col(idCol), hits.as("n_hits"))
      .filter(col("n_hits") > 0)
  }
}
