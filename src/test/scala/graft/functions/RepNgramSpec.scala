package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Gopher Rep-n repetition battery: n-gram construction, duplicate
  * fractions, top-n-gram character coverage. */
class RepNgramSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def metrics(text: String): (Double, Double, Double, Double) = {
    val r = Seq(text).toDF("text")
      .withColumn("__toks", TextFunctions.tokens(col("text")))
      .select(
        TextFunctions.dupNgramFrac(col("__toks"), 1).as("d1"),
        TextFunctions.dupNgramFrac(col("__toks"), 2).as("d2"),
        TextFunctions.dupNgramFrac(col("__toks"), 3).as("d3"),
        TextFunctions.topNgramCharFrac(col("__toks"), 2).as("tc"))
      .head()
    (r.getDouble(0), r.getDouble(1), r.getDouble(2), r.getDouble(3))
  }

  test("tokenNgrams: count is len-n+1; short docs yield empty, not descending") {
    val df = Seq("one two three four", "a b", "").toDF("text")
      .select(size(TextFunctions.tokenNgrams(
        TextFunctions.tokens(col("text")), 3)).as("n"))
    assert(df.as[Int].collect().toSeq === Seq(2, 0, 0))
    val grams = Seq("one two three four").toDF("text")
      .select(TextFunctions.tokenNgrams(TextFunctions.tokens(col("text")), 2))
      .as[Seq[String]].head()
    assert(grams === Seq("one two", "two three", "three four"))
  }

  test("alternating doc: exact hand-computed fractions") {
    // toks = a b a b a b: 6 tokens / 2 types -> dup_tok 4/6;
    // 2-grams (5): ab ba ab ba ab -> 2 distinct -> 3/5;
    // 3-grams (4): 2 distinct -> 2/4;
    // top 2-gram "a b": 3 occurrences x 2 token chars over 6 total -> 1.0
    val (d1, d2, d3, tc) = metrics("a b a b a b")
    assert(d1 === 4.0 / 6.0)
    assert(d2 === 3.0 / 5.0)
    assert(d3 === 2.0 / 4.0)
    assert(tc === 1.0)
  }

  test("unique doc: zero duplicate fractions, coverage = widest gram") {
    // tokens one(3) two(3) three(5) four(4), total 15 chars; the widest
    // 2-gram is "three four" = 9 token chars, each gram occurs once
    val (d1, d2, d3, tc) = metrics("one two three four")
    assert(d1 === 0.0 && d2 === 0.0 && d3 === 0.0)
    assert(tc === 9.0 / 15.0)
  }

  test("degenerate docs: empty and single-token produce all zeros") {
    for (t <- Seq("", "hello", "  ,, ")) {
      val (d1, d2, d3, tc) = metrics(t)
      assert(d1 === 0.0 && d2 === 0.0 && d3 === 0.0 && tc === 0.0, s"text='$t'")
    }
  }

  test("repeated-count doc: coverage picks the max product, not just max count") {
    // "zz zz zz b c b c": "zz zz" occurs 2x (4 chars each -> product 8);
    // "b c" occurs 2x (2 chars -> product 4); singles product <= 4+2=6...
    // ("zz b" 3, "c b" 2): max product = 8 over total chars 3*2+4*1 = 10
    val (_, _, _, tc) = metrics("zz zz zz b c b c")
    assert(tc === 8.0 / 10.0)
  }
}
