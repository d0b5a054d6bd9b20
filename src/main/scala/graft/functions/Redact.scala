package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/**
 * PII detection and redaction over text columns — the scrubbing stage a
 * training-data pipeline runs before any corpus leaves the ingest tier.
 * The reference has no analog (it moves rows, never inspects prose);
 * this extends the north-star text-analysis family.
 *
 * Patterns are deliberately restricted to the regex subset whose
 * semantics are IDENTICAL under java.util.regex (Spark codegen'd
 * regexp_* functions) and RE2 (the DuckDB oracle): character classes,
 * bounded repetition, ASCII word boundaries, no backreferences, no
 * lookaround. That keeps every row oracle-checkable AND keeps the hot
 * path inside whole-stage codegen — no UDF, no interpreted lambda.
 *
 * Scale shape: all functions are narrow per-row projections (zero
 * shuffles); redaction of 100 TB is embarrassingly parallel.
 */
object Redact {

  /** RFC-5322-lite address: local part of word chars + ._%+- at a
    * dotted domain with an alphabetic TLD. */
  val EmailPattern = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"

  /** NANP-style dashed phone: 3-3-4 digit groups, word-bounded so it
    * never fires inside longer digit runs. */
  val PhonePattern = "\\b\\d{3}-\\d{3}-\\d{4}\\b"

  /** Dotted-quad IPv4 (no octet-range check — scrubbing favors recall;
    * word-bounded so version strings like 1.2.3.4.5 still match only
    * once from the left, same greedy-leftmost semantics both engines). */
  val Ipv4Pattern = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"

  def emailCount(text: Column): Column =
    regexp_count(text, lit(EmailPattern)).cast("long")

  def phoneCount(text: Column): Column =
    regexp_count(text, lit(PhonePattern)).cast("long")

  def ipv4Count(text: Column): Column =
    regexp_count(text, lit(Ipv4Pattern)).cast("long")

  /** Replace every match of the three PII families with typed tags.
    * Order matters only for nested-looking text (an email is redacted
    * before its digits could half-match a phone); each replacement is a
    * full-string global pass in both engines. */
  def redactPii(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(text, EmailPattern, "[EMAIL]"),
        PhonePattern, "[PHONE]"),
      Ipv4Pattern, "[IP]")
}
