package graft.extensions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

import graft.functions.TextFunctions

/**
 * Deduplication suite for training-data pipelines (north-star, SURVEY
 * §2.11): exact, MinHash+LSH, SimHash, n-gram Jaccard, embedding-cosine.
 *
 * Scale design (100 TB): every method is shuffle-bounded by a *bucket
 * key* — exact dedup shuffles on a 64/128-bit content hash, MinHash on
 * (band, band-hash), SimHash on band keys, cosine on hyperplane sign
 * buckets. No method ever compares all pairs; candidate generation is a
 * self-join within buckets (skew-safe: buckets are hash-distributed),
 * followed by exact verification on the candidates only.
 */
object Dedup {

  // ---------------------------------------------------------------- exact

  /** Exact duplicate groups by content hash: one row per distinct text,
    * keeping the lowest id (deterministic representative) + group size.
    * Shuffle: one, on the 128-bit md5 — at 100 TB this is the standard
    * map-side-combining aggregate, never a sort. */
  def exactGroups(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.groupBy(md5(col(textCol).cast("binary")).as("text_hash"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_dups"))

  /** Exact dedup: keep one representative row per distinct text. */
  def exactDedup(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val keep = exactGroups(df, idCol, textCol)
      .select(col("keep_id").as(idCol))
    df.join(keep, Seq(idCol), "left_semi")
  }

  // -------------------------------------------------------------- MinHash

  /** Deterministic MinHash signature of the text's word shingles.
    *
    * One 64-bit base hash per shingle, then `numHashes` universal-hash
    * permutations `a_i * h + b_i` (odd multipliers from splitmix64) —
    * the standard "one hash + H permutations" construction, all in
    * codegen'd builtins (no UDF).
    */
  def minhashSignature(text: Column, numHashes: Int = 32, shingleK: Int = 3): Column = {
    // 32-bit base hash x 31-bit odd multiplier keeps every product inside
    // a 63-bit long: no overflow under ANSI mode (Spark 4 default).
    val base = transform(TextFunctions.shingles(text, shingleK),
      s => xxhash64(s).bitwiseAND(lit(0xFFFFFFFFL)))
    val perms = (0 until numHashes).map { i =>
      val (a, b) = permCoeffs(i)
      array_min(transform(base, h => h * lit(a) + lit(b)))
    }
    array(perms: _*)
  }

  /** splitmix64-derived 31-bit odd multiplier + 31-bit offset per
    * permutation index — fixed constants so signatures are reproducible
    * across runs/nodes. */
  private def permCoeffs(i: Int): (Long, Long) = {
    var z = (i.toLong + 0x9E3779B97F4A7C15L) * 0xBF58476D1CE4E5B9L
    z ^= (z >>> 27); z *= 0x94D049BB133111EBL; z ^= (z >>> 31)
    ((z & 0x7FFFFFFFL) | 1L, (z >>> 33) & 0x7FFFFFFFL)
  }

  /**
   * MinHash-LSH candidate pairs: split the signature into `bands` bands
   * of `rows` hashes; docs sharing any band hash become candidates;
   * candidates are verified with exact shingle-set Jaccard.
   *
   * Plan shape: explode to (doc, band, bandHash) -> shuffle on
   * (band, bandHash) -> self-join inside buckets -> distinct pairs ->
   * verify. Band buckets are small by construction, so the join is a
   * bucket-local cartesian of near-constant size, not O(n^2).
   *
   * @return (id_a, id_b, jaccard) with id_a < id_b, jaccard >= threshold
   */
  def minhashDupPairs(
      df: DataFrame, idCol: String, textCol: String,
      bands: Int = 8, rows: Int = 4, shingleK: Int = 3,
      threshold: Double = 0.7): DataFrame = {

    val numHashes = bands * rows
    val sig = df.select(
      col(idCol).as("doc_id"),
      TextFunctions.shingles(col(textCol), shingleK).as("sh"),
      minhashSignature(col(textCol), numHashes, shingleK).as("sig"))

    val banded = sig.select(
      col("doc_id"), col("sh"),
      explode(array((0 until bands).map { b =>
        struct(lit(b).as("band"),
          xxhash64(concat_ws(",",
            slice(col("sig"), b * rows + 1, rows).cast("array<string>"))).as("bh"))
      }: _*)).as("bb"))
      .select(col("doc_id"), col("sh"), col("bb.band"), col("bb.bh"))

    val l = banded.select(col("band"), col("bh"),
      col("doc_id").as("id_a"), col("sh").as("sh_a"))
    val r = banded.select(col("band"), col("bh"),
      col("doc_id").as("id_b"), col("sh").as("sh_b"))

    l.join(r, Seq("band", "bh"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        (size(array_intersect(col("sh_a"), col("sh_b"))).cast("double") /
          size(array_union(col("sh_a"), col("sh_b")))).as("jaccard"))
      .filter(col("jaccard") >= threshold)
      .groupBy(col("id_a"), col("id_b"))
      .agg(max(col("jaccard")).as("jaccard")) // dedupe multi-band hits
  }

  // -------------------------------------------------------------- SimHash

  /** 64-bit SimHash over word tokens, in pure builtins: majority vote per
    * bit of the tokens' xxhash64 values. The per-bit tally unrolls to 64
    * codegen'd array traversals — constant work per row, no shuffle. */
  def simhash64(text: Column): Column = {
    val hashes = transform(TextFunctions.tokens(text), t => xxhash64(t))
    val n = size(hashes)
    val bits = (0 until 64).map { b =>
      // bit b set iff more than half the token hashes have it set
      when(size(filter(hashes, h => shiftright(h, b).bitwiseAND(1L) === 1L)) * 2 > n,
        shiftleft(lit(1L), b)).otherwise(lit(0L))
    }
    bits.reduce((x, y) => x.bitwiseOR(y))
  }

  /** SimHash near-dup candidates: block on 4 x 16-bit bands (any exact
    * band match -> candidate; Hamming-distance<=3 dups always share one
    * by pigeonhole), verify by Hamming distance via bit_count(xor). */
  def simhashDupPairs(
      df: DataFrame, idCol: String, textCol: String,
      maxHamming: Int = 3): DataFrame = {

    val sh = df.select(col(idCol).as("doc_id"), simhash64(col(textCol)).as("sh"))
    val banded = sh.select(col("doc_id"), col("sh"),
      explode(array((0 until 4).map { b =>
        struct(lit(b).as("band"),
          shiftright(col("sh"), b * 16).bitwiseAND(0xFFFFL).as("bh"))
      }: _*)).as("bb"))
      .select(col("doc_id"), col("sh"), col("bb.band"), col("bb.bh"))

    val l = banded.select(col("band"), col("bh"), col("doc_id").as("id_a"), col("sh").as("sh_a"))
    val r = banded.select(col("band"), col("bh"), col("doc_id").as("id_b"), col("sh").as("sh_b"))
    l.join(r, Seq("band", "bh"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        bit_count(col("sh_a").bitwiseXOR(col("sh_b"))).cast(LongType).as("hamming"))
      .filter(col("hamming") <= maxHamming)
      .groupBy(col("id_a"), col("id_b"))
      .agg(min(col("hamming")).as("hamming"))
  }

  // ------------------------------------------------------ n-gram Jaccard

  /** Exact n-gram Jaccard similarity for given candidate pairs (or, for
    * bounded inputs, all pairs sharing at least one shingle — an
    * inverted-index join, still never a full cross product). */
  def ngramJaccardPairs(
      df: DataFrame, idCol: String, textCol: String,
      shingleK: Int = 3, threshold: Double = 0.5): DataFrame = {

    val sh = df.select(col(idCol).as("doc_id"),
      TextFunctions.shingles(col(textCol), shingleK).as("sh"))
    // inverted index: shingle -> docs; pairs co-occurring under a shingle
    val inv = sh.select(col("doc_id"), col("sh"), explode(col("sh")).as("gram"))
    val l = inv.select(col("gram"), col("doc_id").as("id_a"), col("sh").as("sh_a"))
    val r = inv.select(col("gram"), col("doc_id").as("id_b"), col("sh").as("sh_b"))
    l.join(r, Seq("gram"))
      .filter(col("id_a") < col("id_b"))
      .groupBy(col("id_a"), col("id_b"))
      .agg(first(col("sh_a")).as("sh_a"), first(col("sh_b")).as("sh_b"))
      .select(col("id_a"), col("id_b"),
        (size(array_intersect(col("sh_a"), col("sh_b"))).cast("double") /
          size(array_union(col("sh_a"), col("sh_b")))).as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }

  // ------------------------------------------------- embedding cosine dup

  /** Embedding near-duplicate pairs via sign-LSH bucketing + exact cosine
    * verification. See Similarity.scala for the shared primitives. */
  def embeddingDupPairs(
      df: DataFrame, idCol: String, vecCol: String,
      threshold: Double = 0.95, planes: Int = 16): DataFrame = {

    val withBucket = df.select(col(idCol).as("vec_a"), col(vecCol).as("v_a"),
      Similarity.signBucket(col(vecCol), planes).as("bucket"))
    val r = withBucket.select(col("bucket"),
      col("vec_a").as("vec_b"), col("v_a").as("v_b"))
    withBucket.join(r, Seq("bucket"))
      .filter(col("vec_a") < col("vec_b"))
      .select(col("vec_a").as("id_a"), col("vec_b").as("id_b"),
        Similarity.cosine(col("v_a"), col("v_b")).as("cosine"))
      .filter(col("cosine") >= threshold)
      .groupBy(col("id_a"), col("id_b"))
      .agg(max(col("cosine")).as("cosine"))
  }
}
