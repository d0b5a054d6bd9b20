package graft.sources

import org.scalatest.funsuite.AnyFunSuite

import graft.schema.SourceColumn
import graft.util.Util.utcTs

class SqlGenSpec extends AnyFunSuite {

  private val cols = Seq(
    SourceColumn("id", "int8", ordinalPosition = 1),
    SourceColumn("tags", "_text", ordinalPosition = 4),
    SourceColumn("updated", "timestamptz", ordinalPosition = 3),
    SourceColumn("name", "varchar", ordinalPosition = 2))

  test("snapshot query: ordinal projection, snapshot_tm, half-open window") {
    val sql = SqlGen.snapshotQuery("public", "accounts", cols, "updated",
      utcTs("2024-01-05 00:00:00"), utcTs("2024-01-15 00:00:00"))
    assert(sql.startsWith("""SELECT "id", "name", "updated", "tags", now() AS snapshot_tm"""))
    assert(sql.contains("""FROM "public"."accounts""""))
    assert(sql.contains("\"updated\" > {ts '2024-01-05 00:00:00.000000'}"))
    assert(sql.contains("\"updated\" <= {ts '2024-01-15 00:00:00.000000'}"))
  }

  test("compat mode: arrays as array_to_json; munging CASE on timestamps") {
    val sql = SqlGen.snapshotQuery("public", "accounts", cols, "updated",
      utcTs("2024-01-05 00:00:00"), utcTs("2024-01-15 00:00:00"),
      munge = Some(SqlGen.MungeSql(utcTs("1970-01-01 00:00:00"), toNull = true)),
      jsonArrays = true)
    assert(sql.contains("""array_to_json("tags") AS "tags""""))
    assert(sql.contains("""CASE WHEN "updated" < {ts '1970-01-01 00:00:00.000000'} THEN NULL"""))
  }

  test("identifier quoting blocks injection vectors") {
    val evil = Seq(SourceColumn("a\"; DROP TABLE x; --", "text", ordinalPosition = 1))
    val sql = SqlGen.snapshotQuery("s", "t", evil, "a",
      utcTs("2024-01-01 00:00:00"), utcTs("2024-01-02 00:00:00"))
    assert(sql.contains("\"a\"\"; DROP TABLE x; --\""))
    val disc = SqlGen.discoveryQuery("sch'ema", "nms'col")
    assert(disc.contains("sch''ema") && disc.contains("nms''col"))
  }

  test("catalog query shapes (S3/S5/S7)") {
    assert(SqlGen.discoveryQuery("public", "not_modified_since")
      .contains("information_schema.columns"))
    assert(SqlGen.primaryKeyQuery("accounts").contains("PRIMARY KEY"))
    assert(SqlGen.seedWatermarkQuery("public", "accounts", "updated")
      == """SELECT MIN("updated") FROM "public"."accounts"""")
  }
}
