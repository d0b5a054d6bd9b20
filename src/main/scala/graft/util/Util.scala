package graft.util

import java.sql.Timestamp
import java.time.{LocalDateTime, ZoneOffset}
import java.time.format.DateTimeFormatter

/** Small shared helpers. */
object Util {

  private val Fmt = DateTimeFormatter.ofPattern("yyyy-MM-dd HH:mm:ss")

  /** Parse `yyyy-MM-dd HH:mm:ss` as a UTC instant — independent of the JVM
    * default timezone, so query literals line up with the UTC session tz and
    * the DuckDB oracle's naive timestamps. */
  def utcTs(s: String): Timestamp =
    Timestamp.from(LocalDateTime.parse(s, Fmt).toInstant(ZoneOffset.UTC))
}
