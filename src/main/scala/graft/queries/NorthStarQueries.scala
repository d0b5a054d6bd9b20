package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

import graft.extensions.{Dedup, Multimodal, Similarity}
import graft.functions.TextFunctions
import graft.sources.Tables

/**
 * North-star extension queries (SURVEY §2.11): dedup, similarity search,
 * text analysis, multimodal plumbing over `documents` / `embeddings`.
 *
 * SQL-oracle'd where cross-engine determinism is airtight (hashes,
 * lengths, counts, per-row IEEE arithmetic); hash/LSH-based operators
 * whose constants DuckDB cannot reproduce are declared without oracle
 * (driver records a rows-only check) and are instead invariant-tested in
 * ScalaTest.
 */
object NorthStarQueries {

  private def docs(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "documents")
  private def embs(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "embeddings")

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ---- dedup --------------------------------------------------------
    "dedup_exact_groups" -> ((s, dir) =>
      Dedup.exactGroups(docs(s, dir), "doc_id", "text")),
    "dedup_exact" -> ((s, dir) =>
      Dedup.exactDedup(docs(s, dir), "doc_id", "text")),
    "dedup_minhash_pairs" -> ((s, dir) =>
      Dedup.minhashDupPairs(docs(s, dir), "doc_id", "text", threshold = 0.5)),
    "dedup_simhash_pairs" -> ((s, dir) =>
      Dedup.simhashDupPairs(docs(s, dir), "doc_id", "text", maxHamming = 6)),
    "dedup_ngram_jaccard" -> ((s, dir) =>
      // restrict to one source to bound the inverted-index fanout at test SFs
      Dedup.ngramJaccardPairs(docs(s, dir).filter(col("source") === "src0"),
        "doc_id", "text", threshold = 0.5)),
    "dedup_embedding_pairs" -> ((s, dir) =>
      Dedup.embeddingDupPairs(embs(s, dir), "vec_id", "embedding",
        threshold = 0.9, planes = 12)),

    // ---- similarity search -------------------------------------------
    "sim_topk_brute" -> ((s, dir) => {
      val e = embs(s, dir)
      Similarity.bruteForceTopK(e, e.filter(col("vec_id") % 100 === 0),
        "vec_id", "embedding", k = 10)
        .select(col("query_id"), col("neighbor_id"), col("rank"))
    }),
    "sim_topk_lsh" -> ((s, dir) => {
      val e = embs(s, dir)
      Similarity.lshTopK(e, e.filter(col("vec_id") % 100 === 0),
        "vec_id", "embedding", k = 10, planes = 8, bands = 4)
        .select(col("query_id"), col("neighbor_id"), col("rank"))
    }),
    "sim_topk_ivf" -> ((s, dir) => {
      val e = embs(s, dir)
      Similarity.ivfTopK(e, e.filter(col("vec_id") % 100 === 0),
        "vec_id", "embedding", k = 10, nlist = 16, nprobe = 4)
        .select(col("query_id"), col("neighbor_id"), col("rank"))
    }),
    "embeddings_stats" -> ((s, dir) =>
      embs(s, dir).groupBy(col("label")).agg(
        count(lit(1)).as("n"),
        min(size(col("embedding"))).cast(LongType).as("min_dim"),
        max(size(col("embedding"))).cast(LongType).as("max_dim"))),

    // ---- text analysis -----------------------------------------------
    "text_stats" -> ((s, dir) =>
      docs(s, dir).select(
        col("doc_id"),
        length(col("text")).cast(LongType).as("n_chars_calc"),
        octet_length(col("text")).cast(LongType).as("n_bytes"),
        TextFunctions.tokenCountWs(col("text")).as("n_tokens_ws"))),
    "text_fingerprint" -> ((s, dir) =>
      docs(s, dir).select(
        col("doc_id"),
        TextFunctions.fingerprintMd5(col("text")).as("fingerprint"))),
    "text_quality" -> ((s, dir) =>
      docs(s, dir).select(
        col("doc_id"),
        TextFunctions.punctRatio(col("text")).as("punct_ratio"),
        TextFunctions.digitRatio(col("text")).as("digit_ratio"),
        TextFunctions.stopwordRatio(col("text")).as("stopword_ratio"))),
    "text_langid" -> ((s, dir) =>
      docs(s, dir).select(
        col("doc_id"),
        TextFunctions.langId(col("text")).as("lang_pred"),
        TextFunctions.tokenCountBpe(col("text")).as("n_tokens_bpe"),
        TextFunctions.qualityScore(col("text")).as("quality"))),

    // ---- multimodal plumbing -----------------------------------------
    "multimodal_meta" -> ((s, dir) =>
      Multimodal.withMediaColumn(docs(s, dir), "text").select(
        col("doc_id"),
        col("media_meta.format").as("format"),
        col("media_meta.n_bytes").as("n_bytes"),
        col("media_meta.checksum").as("checksum"))),
    "multimodal_features" -> ((s, dir) =>
      Multimodal.extractFeatures(s,
        Multimodal.withMediaColumn(docs(s, dir), "text"), "doc_id")
        .toDF().select(col("id"), col("format"), col("n_bytes"),
          col("width").cast(LongType).as("width"),
          col("height").cast(LongType).as("height"))),
    "multimodal_frames" -> ((s, dir) =>
      Multimodal.sampleFrames(
        Multimodal.withMediaColumn(docs(s, dir), "text"), "doc_id", 64)))

  val oracles: Map[String, String] = Map(
    "dedup_exact_groups" ->
      """SELECT md5(text) AS text_hash, min(doc_id) AS keep_id, count(*) AS n_dups
        | FROM documents GROUP BY md5(text)""".stripMargin,
    "dedup_exact" ->
      """SELECT doc_id, text, lang, source, n_chars FROM documents
        | WHERE doc_id IN (SELECT min(doc_id) FROM documents GROUP BY text)""".stripMargin,
    "embeddings_stats" ->
      """SELECT label, count(*) AS n,
        | CAST(min(len(embedding)) AS BIGINT) AS min_dim,
        | CAST(max(len(embedding)) AS BIGINT) AS max_dim
        | FROM embeddings GROUP BY label""".stripMargin,
    "text_stats" ->
      """SELECT doc_id, CAST(length(text) AS BIGINT) AS n_chars_calc,
        | CAST(strlen(text) AS BIGINT) AS n_bytes,
        | CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT) AS n_tokens_ws
        | FROM documents""".stripMargin,
    "text_fingerprint" ->
      """SELECT doc_id, md5(regexp_replace(lower(text), '\s+', ' ', 'g')) AS fingerprint
        | FROM documents""".stripMargin,
    "text_quality" ->
      """SELECT doc_id,
        | CASE WHEN length(text) = 0 THEN 0.0
        |      ELSE CAST(length(regexp_replace(text, '[\p{L}\p{N}\s]', '', 'g')) AS DOUBLE) / length(text) END AS punct_ratio,
        | CASE WHEN length(text) = 0 THEN 0.0
        |      ELSE CAST(length(regexp_replace(text, '[^\p{N}]', '', 'g')) AS DOUBLE) / length(text) END AS digit_ratio,
        | CASE WHEN len(toks) = 0 THEN 0.0
        |      ELSE CAST(len(list_filter(toks, t -> list_contains(['the','a','an','and','or','of','to','in','is','are','was','for','on','with','that','this','it','as','at','by','be'], t))) AS DOUBLE) / len(toks) END AS stopword_ratio
        | FROM (SELECT doc_id, text,
        |         list_filter(string_split_regex(lower(text), '[^\p{L}\p{N}]+'), t -> length(t) > 0) AS toks
        |       FROM documents) d""".stripMargin,
    "multimodal_meta" ->
      """SELECT doc_id, 'raw' AS format,
        | CAST(strlen(text) AS BIGINT) AS n_bytes,
        | md5(text) AS checksum
        | FROM documents""".stripMargin,
    "multimodal_frames" ->
      """SELECT doc_id, CAST(n_bytes AS BIGINT) AS n_bytes, CAST(f AS BIGINT) AS frame_no,
        | CAST(f * 64 AS BIGINT) AS byte_offset
        | FROM (SELECT doc_id, strlen(text) AS n_bytes,
        |         unnest(generate_series(0, greatest((strlen(text) - 1) // 64, 0))) AS f
        |       FROM documents) t""".stripMargin)
}
