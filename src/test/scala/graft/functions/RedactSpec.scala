package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** PII detection + redaction: pattern semantics and boundary behavior. */
class RedactSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def one(text: String): (Long, Long, Long, String) = {
    val r = Seq(text).toDF("t").select(
      Redact.emailCount($"t").as("e"),
      Redact.phoneCount($"t").as("p"),
      Redact.ipv4Count($"t").as("i"),
      Redact.redactPii($"t").as("r")).head()
    (r.getAs[Long]("e"), r.getAs[Long]("p"), r.getAs[Long]("i"),
      r.getAs[String]("r"))
  }

  test("each family detected and redacted with its typed tag") {
    val (e, p, i, r) = one(
      "Mail a.b+tag@sub.example.org, call 555-867-5309, host 10.0.0.1 done")
    assert((e, p, i) === ((1L, 1L, 1L)))
    assert(r === "Mail [EMAIL], call [PHONE], host [IP] done")
  }

  test("clean text passes through untouched") {
    val (e, p, i, r) = one("no contact details in this sentence at all")
    assert((e, p, i) === ((0L, 0L, 0L)))
    assert(r === "no contact details in this sentence at all")
  }

  test("multiple occurrences all counted and all replaced") {
    val (e, _, _, r) = one("x@y.com then z@w.net")
    assert(e === 2L)
    assert(r === "[EMAIL] then [EMAIL]")
  }

  test("word boundaries: longer digit runs never half-match") {
    // 3-3-5 digit groups: the trailing \b fails inside the 5-digit run
    val (_, p1, _, r1) = one("order 123-456-78901 is not a phone")
    assert(p1 === 0L && r1.contains("123-456-78901"))
    // 5 dotted groups: leftmost-greedy matches ONE IP from the left,
    // identically in java.util.regex and RE2
    val (_, _, i2, _) = one("version 1.2.3.4.5 string")
    assert(i2 === 1L)
  }

  test("digits inside an email local part do not fire the IP pattern") {
    val (e, p, i, r) = one("customer.000000042@example.com wrote in")
    assert((e, p, i) === ((1L, 0L, 0L)))
    assert(r === "[EMAIL] wrote in")
  }

  test("redaction order: an emails digits are gone before phone/ip passes") {
    val (e, p, i, r) = one("a123-456-7890@mail.co")
    // the whole thing is one email (local part allows digits and -)
    assert((e, p, i) === ((1L, 0L, 0L)))
    assert(r === "[EMAIL]")
  }
}
