package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class HashExpressionsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("hashed_shingles: distinct sorted k-gram hashes; short text degrades to one") {
    val df = Seq("a b c d", "a b c d", "x y", "a b c d e").toDF("t")
    val rows = df.select(HashExpressions.hashed_shingles(
      TextFunctions.tokens(col("t")), 3)).as[Seq[Long]].collect()
    assert(rows(0) == rows(1))                 // deterministic
    assert(rows(0).length == 2)                // "a b c", "b c d"
    assert(rows(0) == rows(0).sorted)          // sorted
    assert(rows(2).length == 1)                // fewer tokens than k -> 1 shingle
    assert(rows(3).toSet.intersect(rows(0).toSet).size == 2) // "a b c","b c d" shared
  }

  test("minhash_signature agrees between string and pre-hashed long inputs on set semantics") {
    val df = Seq("the quick brown fox jumps over the lazy dog").toDF("t")
    val viaLongs = df.select(HashExpressions.minhash_signature(
      HashExpressions.hashed_shingles(TextFunctions.tokens(col("t")), 3), 16))
      .as[Seq[Long]].head()
    assert(viaLongs.length == 16)
    // identical text -> identical signature; different text -> different
    val df2 = Seq(("the quick brown fox jumps over the lazy dog",
      "a completely different sentence with other words entirely")).toDF("a", "b")
    val pair = df2.select(
      HashExpressions.minhash_signature(
        HashExpressions.hashed_shingles(TextFunctions.tokens(col("a")), 3), 16),
      HashExpressions.minhash_signature(
        HashExpressions.hashed_shingles(TextFunctions.tokens(col("b")), 3), 16))
      .as[(Seq[Long], Seq[Long])].head()
    assert(pair._1 == viaLongs && pair._1 != pair._2)
  }

  test("minhash permutations are decorrelated: slot agreement tracks Jaccard") {
    // Regression pin for the correlated-permutation bug: with the bare
    // affine map (a*h + b, no wraparound — order-preserving in h), the
    // element with the globally smallest base hash won EVERY slot, so a
    // pair differing only in that element agreed on 0/32 slots despite
    // Jaccard ~1 (9 of 256 true pairs at sf0.1 missed every banding).
    // Construct that adversarial shape directly on pre-hashed longs:
    // B = A minus A's minimal element. Proper minhash must still agree
    // on ~|A∩B|/|A∪B| of slots; the broken kernel scores 0.
    val n = 200
    val shared = (1 to n).map(i => i * 0x9E3779B9L & 0xFFFFFFFFL).distinct.sorted
    val a = (0L +: shared).sorted // 0 is the minimal base hash everywhere
    val b = shared
    val df = Seq((a, b)).toDF("a", "b")
    val (sa, sb) = df.select(
      HashExpressions.minhash_signature(col("a"), 32),
      HashExpressions.minhash_signature(col("b"), 32))
      .as[(Seq[Long], Seq[Long])].head()
    val agree = sa.zip(sb).count(p => p._1 == p._2)
    // E[agree] = 32 * J = 32 * n/(n+1) ~ 31.8; binomial tail makes < 24
    // astronomically unlikely for a correct kernel, and the broken one
    // scored exactly 0 here.
    assert(agree >= 24, s"minhash slots collapsed to a shared ordering: " +
      s"agreement $agree/32 for Jaccard ${n.toDouble / (n + 1)}")

    // and two UNRELATED sets must not agree (distinct mins per slot)
    val c = (1 to n).map(i => (i * 0x517CC1B7L + 99L) & 0xFFFFFFFFL).distinct.sorted
    val (sa2, sc) = Seq((a, c)).toDF("a", "c").select(
      HashExpressions.minhash_signature(col("a"), 32),
      HashExpressions.minhash_signature(col("c"), 32))
      .as[(Seq[Long], Seq[Long])].head()
    assert(sa2.zip(sc).count(p => p._1 == p._2) <= 8)
  }

  test("codegen path compiles and matches interpreted eval for all five expressions") {
    import graft.functions.{VectorExpressions => VE}
    val docs = Seq(
      ("one two three four five six", Array(0.1f, -0.2f, 0.3f, 0.4f)),
      ("alpha beta gamma delta epsilon", Array(-0.5f, 0.6f, -0.7f, 0.8f)),
      ("one two three four five seven", Array(0.11f, -0.19f, 0.29f, 0.41f))
    ).toDF("t", "v")
    val probe = Seq(Array(1.0f, 0.0f, -1.0f, 0.5f)).toDF("p")

    def results(mode: String): Seq[org.apache.spark.sql.Row] = {
      spark.conf.set("spark.sql.codegen.factoryMode", mode)
      spark.conf.set("spark.sql.codegen.fallback", mode != "CODEGEN_ONLY")
      try {
        docs.crossJoin(probe).select(
          HashExpressions.hashed_shingles(TextFunctions.tokens(col("t")), 3),
          HashExpressions.minhash_signature(
            HashExpressions.hashed_shingles(TextFunctions.tokens(col("t")), 3), 16),
          HashExpressions.simhash64(TextFunctions.tokens(col("t"))),
          VE.cosine_similarity(col("v"), col("p")),
          VE.sign_lsh_bucket(col("v"), 16, 7)
        ).collect().toSeq
      } finally {
        spark.conf.unset("spark.sql.codegen.factoryMode")
        spark.conf.unset("spark.sql.codegen.fallback")
      }
    }
    // CODEGEN_ONLY + fallback=false throws if any expression fails to
    // compile — this is the "no silent CodegenFallback" regression gate.
    val gen = results("CODEGEN_ONLY")
    val interp = results("NO_CODEGEN")
    assert(gen == interp)
  }

  test("mistyped inputs fail at analysis, not at runtime") {
    import org.apache.spark.sql.AnalysisException
    import graft.functions.{TextExpressions => TE, VectorExpressions => VE}
    HashExpressions.register(spark)
    TE.register(spark)
    val df = Seq(("plain text", Array(0.1f, 0.2f), Array(1.0d, 2.0d)))
      .toDF("t", "vf", "vd")
    df.createOrReplaceTempView("typecheck_t")

    // SQL path: a bare string (not array<string>) into each registered fn
    for (q <- Seq(
      "SELECT simhash64(t) FROM typecheck_t",
      "SELECT minhash_signature(t, 16) FROM typecheck_t",
      "SELECT lang_id(t) FROM typecheck_t",
      "SELECT stopword_hits(t) FROM typecheck_t")) {
      val e = intercept[AnalysisException](spark.sql(q).collect())
      assert(e.getMessage.contains("array<string>"), s"$q -> ${e.getMessage}")
    }

    // Column path: wrong element type (double vs float), wrong child type
    val cosBad = intercept[AnalysisException](
      df.select(VE.cosine_similarity(col("vf"), col("vd"))).collect())
    assert(cosBad.getMessage.contains("array<float>"))
    val lshBad = intercept[AnalysisException](
      df.select(VE.sign_lsh_bucket(col("t"), 8)).collect())
    assert(lshBad.getMessage.contains("array<float>"))
    val shBad = intercept[AnalysisException](
      df.select(HashExpressions.hashed_shingles(col("vf"), 3)).collect())
    assert(shBad.getMessage.contains("array<string>"))

    // bad static params are analysis errors too
    val kBad = intercept[AnalysisException](
      df.select(HashExpressions.hashed_shingles(
        TextFunctions.tokens(col("t")), 0)).collect())
    assert(kBad.getMessage.contains("k must be >= 1"))
    val planesBad = intercept[AnalysisException](
      df.select(VE.sign_lsh_bucket(col("vf"), 64)).collect())
    assert(planesBad.getMessage.contains("planes"))

    // and the correctly-typed calls still analyze + run
    assert(df.select(
      HashExpressions.simhash64(TextFunctions.tokens(col("t"))),
      VE.cosine_similarity(col("vf"), col("vf")),
      TE.lang_id(TextFunctions.tokens(col("t")))).count() == 1L)
  }

  test("sorted_intersect_count equals size(array_intersect) on sorted distinct arrays") {
    // the kernel's input contract is the hashed_shingles output (sorted
    // distinct); randomized cross-check against the builtin it replaced,
    // including the edge shapes: empty, disjoint, identical, subset
    val rnd = new scala.util.Random(42)
    val cases = Seq(
      (Seq.empty[Long], Seq.empty[Long]),
      (Seq.empty[Long], Seq(1L, 2L)),
      (Seq(1L, 2L, 3L), Seq(1L, 2L, 3L)),
      (Seq(1L, 3L, 5L), Seq(2L, 4L, 6L)),
      (Seq(1L, 2L, 3L, 4L), Seq(2L, 4L))
    ) ++ (1 to 50).map { _ =>
      def arr() = Seq.fill(rnd.nextInt(40))(rnd.nextInt(30).toLong)
        .distinct.sorted
      (arr(), arr())
    }
    val df = cases.toDF("a", "b")
    val got = df.select(
      HashExpressions.sorted_intersect_count(col("a"), col("b")),
      size(array_intersect(col("a"), col("b"))).cast("long"))
      .as[(Long, Long)].collect()
    got.zip(cases).foreach { case ((k, builtin), c) =>
      assert(k == builtin, s"mismatch on $c") }

    // codegen and interpreted paths agree (same gate as the other kernels)
    def modes(mode: String) = {
      spark.conf.set("spark.sql.codegen.factoryMode", mode)
      spark.conf.set("spark.sql.codegen.fallback", mode != "CODEGEN_ONLY")
      try df.select(HashExpressions.sorted_intersect_count(col("a"), col("b")))
        .as[Long].collect().toSeq
      finally {
        spark.conf.unset("spark.sql.codegen.factoryMode")
        spark.conf.unset("spark.sql.codegen.fallback")
      }
    }
    assert(modes("CODEGEN_ONLY") == modes("NO_CODEGEN"))
  }

  test("simhash64: identical tokens identical hash; SQL registration works") {
    HashExpressions.register(spark)
    val df = Seq("alpha beta gamma delta", "alpha beta gamma delta", "zz yy xx ww")
      .toDF("t")
    df.createOrReplaceTempView("hx_t")
    val viaSql = spark.sql(
      "SELECT simhash64(filter(split(lower(t), '[^\\\\p{L}\\\\p{N}]+'), x -> length(x) > 0)) FROM hx_t")
      .as[Long].collect()
    assert(viaSql(0) == viaSql(1) && viaSql(0) != viaSql(2))
    val viaCol = df.select(HashExpressions.simhash64(
      TextFunctions.tokens(col("t")))).as[Long].collect()
    assert(viaCol.toSeq == viaSql.toSeq)
  }
}
