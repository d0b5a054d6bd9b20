package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class TextFunctionsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("tokens + counts") {
    val df = Seq("The quick, brown fox!  Jumps 42 times.").toDF("t")
    val row = df.select(
      TextFunctions.tokens(col("t")),
      TextFunctions.tokenCountWs(col("t")),
      TextFunctions.tokenCountBpe(col("t"))).head()
    assert(row.getSeq[String](0) == Seq("the", "quick", "brown", "fox", "jumps", "42", "times"))
    assert(row.getLong(1) == 7L) // whitespace runs: double space counts once
    assert(row.getLong(2) >= 9L) // bpe-ish counts punctuation too
  }

  test("fingerprint is whitespace/case invariant; distinct content differs") {
    val df = Seq(
      ("A  Quick   Fox", "a quick fox", "a quick wolf")).toDF("a", "b", "c")
    val row = df.select(
      TextFunctions.fingerprintMd5(col("a")) === TextFunctions.fingerprintMd5(col("b")),
      TextFunctions.fingerprintMd5(col("b")) === TextFunctions.fingerprintMd5(col("c")),
      TextFunctions.fingerprint64(col("a")) === TextFunctions.fingerprint64(col("b"))).head()
    assert(row.getBoolean(0) && !row.getBoolean(1) && row.getBoolean(2))
  }

  test("langId picks the dominant profile") {
    val df = Seq(
      "the cat is on the mat and it was nice",
      "der hund ist nicht mit der katze und das ist gut",
      "le chat est dans la maison et les oiseaux",
      "el perro es un animal que vive por la casa",
      "xyzzy plugh qwerty").toDF("t")
    val langs = df.select(TextFunctions.langId(col("t"))).as[String].collect().toSeq
    assert(langs == Seq("en", "de", "fr", "es", "und"))
  }

  test("quality metrics ranges and shingles") {
    val df = Seq("good clean text with the usual words in it for scoring").toDF("t")
    val row = df.select(
      TextFunctions.punctRatio(col("t")),
      TextFunctions.stopwordRatio(col("t")),
      TextFunctions.qualityScore(col("t")),
      TextFunctions.shingles(col("t"), 3)).head()
    assert(row.getDouble(0) == 0.0)
    assert(row.getDouble(1) > 0.0 && row.getDouble(1) < 1.0)
    assert(row.getDouble(2) > 0.0 && row.getDouble(2) <= 1.0)
    val sh = row.getSeq[String](3)
    assert(sh.head == "good clean text" && sh.last == "it for scoring")
  }

  test("shingles of short text degrade to single whole-text shingle") {
    val df = Seq("two words").toDF("t")
    assert(df.select(TextFunctions.shingles(col("t"), 3)).head()
      .getSeq[String](0) == Seq("two words"))
  }

  test("native langId/stopword kernels match the composed forms on the corpus (both codegen modes)") {
    val docs = graft.sources.Tables.load(spark, graft.TestSpark.Sf0001, "documents")
      .withColumn("__toks", TextFunctions.tokens(col("text")))
    def run(mode: String) = {
      spark.conf.set("spark.sql.codegen.factoryMode", mode)
      spark.conf.set("spark.sql.codegen.fallback", mode != "CODEGEN_ONLY")
      try {
        val both = docs.select(
          TextFunctions.langIdFromTokens(col("__toks")).as("k_lang"),
          TextFunctions.langIdComposed(col("__toks")).as("c_lang"),
          TextFunctions.stopwordRatioFromTokens(col("__toks")).as("k_sw"),
          TextFunctions.stopwordRatioComposed(col("__toks")).as("c_sw"))
        assert(both.filter(col("k_lang") =!= col("c_lang")).isEmpty)
        assert(both.filter(col("k_sw") =!= col("c_sw")).isEmpty)
        both.collect()
      } finally {
        spark.conf.unset("spark.sql.codegen.factoryMode")
        spark.conf.unset("spark.sql.codegen.fallback")
      }
    }
    assert(run("CODEGEN_ONLY").toSeq == run("NO_CODEGEN").toSeq)

    // NULL text resolves to "und" on both paths (the kernel expression
    // null-propagates; the wrapper coalesces to match the composed form)
    val nullDf = Seq(Option.empty[String]).toDF("text")
      .withColumn("__toks", TextFunctions.tokens(col("text")))
    assert(nullDf.select(
      TextFunctions.langIdFromTokens(col("__toks")),
      TextFunctions.langIdComposed(col("__toks"))).head() ==
      org.apache.spark.sql.Row("und", "und"))
  }

  test("hashSplit: deterministic, total, and roughly 80/10/10") {
    val ids = (0L until 2000L).toDF("id").select(col("id").cast("string").as("k"))
    val splits = ids.select(col("k"), TextFunctions.hashSplit(col("k")).as("s"))
    val counts = splits.groupBy("s").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts.keySet == Set("train", "val", "test"))
    assert(counts.values.sum == 2000L)
    assert(counts("train") > 1400 && counts("train") < 1800) // ~80%
    assert(counts("val") > 100 && counts("val") < 320)       // ~10%
    // rerun -> byte-identical assignment (no RNG anywhere)
    val again = ids.select(col("k"), TextFunctions.hashSplit(col("k")).as("s"))
    assert(splits.except(again).isEmpty && again.except(splits).isEmpty)
  }

  test("qualityGate keeps prose and rejects noise") {
    val df = Seq(
      ("good", "the quick brown fox and the lazy dog went to the market in town " * 4),
      ("punct", "!!! ??? *** ### $$$ %%% the and of to !!! ??? *** ### $$$ %%%"),
      ("short", "the of"),
      ("nonenglish", "der die das und ist nicht ein mit von zu " * 8)
    ).toDF("tag", "t")
    val kept = df.filter(TextFunctions.qualityGate(col("t")))
      .select("tag").as[String].collect().toSet
    assert(kept == Set("good"))
  }

  test("hashedLinearScore: presence semantics, additivity, exact arithmetic") {
    def score(texts: String*): Seq[Double] = texts.toDF("t")
      .select(TextFunctions.hashedLinearScore(
        TextFunctions.tokens(col("t"))).as("s"))
      .as[Double].collect().toSeq

    // empty / punctuation-only -> zero (no features)
    assert(score("", "!!! ???") == Seq(0.0, 0.0))

    // PRESENCE features: token multiplicity never changes the score
    assert(score("alpha alpha alpha") == score("alpha"))

    // additivity over distinct tokens (holds whether or not the tokens
    // share a bucket — the fold just sums each distinct token's weight)
    val Seq(a, b, ab) = score("alpha", "bravo", "alpha bravo")
    assert(ab == a + b, "exact-fraction weights: sum must be EXACT")

    // every weight is a multiple of 1/16 in [-10/16, 10/16], so any
    // score is a multiple of 1/16 — the order-independence guarantee
    val s = score("the quick brown fox jumped over a lazy dog today")
    assert(s.head == math.rint(s.head * 16.0) / 16.0)

    // word order can't matter (set-of-tokens semantics + exact sums)
    assert(score("gamma delta epsilon") == score("epsilon gamma delta"))
  }
}
