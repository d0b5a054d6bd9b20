package graft.schema

import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

class TypeMapperSpec extends AnyFunSuite {

  private def tpe(udt: String, p: Option[Int] = None, s: Option[Int] = None) =
    TypeMapper.toSparkType(SourceColumn("c", udt, numericPrecision = p, numericScale = s))

  test("scalar mappings (SURVEY §1.3)") {
    assert(tpe("int2") == ShortType)
    assert(tpe("int4") == IntegerType)
    assert(tpe("int8") == LongType)
    assert(tpe("float4") == FloatType)
    assert(tpe("float8") == DoubleType) // NOT decimal: reference bug not reproduced
    assert(tpe("bool") == BooleanType)
    assert(tpe("bytea") == BinaryType)
    assert(tpe("date") == DateType)
    assert(tpe("abstime") == TimestampNTZType)
    assert(tpe("timestamp") == TimestampType)
    assert(tpe("timestamptz") == TimestampType)
    assert(tpe("json") == StringType)
    assert(tpe("jsonb") == StringType)
    assert(tpe("oid") == LongType)
    assert(tpe("xid") == LongType)
    assert(tpe("varchar") == StringType)
    assert(tpe("interval") == StringType)
  }

  test("numeric keeps precision AND scale") {
    assert(tpe("numeric", Some(18), Some(4)) == DecimalType(18, 4))
    assert(tpe("numeric") == DecimalType(38, 18))
  }

  test("arrays stay native ArrayType (not JSON strings)") {
    assert(tpe("_text") == ArrayType(StringType, containsNull = true))
    assert(tpe("_int4") == ArrayType(IntegerType, containsNull = true))
    assert(tpe("int2vector") == ArrayType(ShortType, containsNull = false))
    assert(tpe("oidvector") == ArrayType(LongType, containsNull = false))
    assert(tpe("tsvector") == StringType)
  }

  test("unknown udt falls back to STRING (totality)") {
    assert(tpe("some_custom_enum") == StringType)
    assert(tpe("") == StringType)
  }

  test("StructType JSON round-trip") {
    val cols = Seq(
      SourceColumn("id", "int8", nullable = false, ordinalPosition = 1),
      SourceColumn("tags", "_text", ordinalPosition = 3),
      SourceColumn("amount", "numeric", ordinalPosition = 2,
        numericPrecision = Some(12), numericScale = Some(2)))
    val st = TypeMapper.toStructType(cols)
    assert(st.fieldNames.toSeq == Seq("id", "amount", "tags")) // ordinal order
    assert(TypeMapper.schemaFromJson(TypeMapper.schemaToJson(st)) == st)
  }

  test("drift detection") {
    val a = StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("name", StringType)))
    val b = StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("name", IntegerType), // changed
      StructField("extra", BooleanType))) // added
    val d = TypeMapper.drift(a, b)
    assert(d.added.map(_.name) == Seq("extra"))
    assert(d.removed.isEmpty)
    assert(d.changed.map(_._1.name) == Seq("name"))
    assert(TypeMapper.drift(a, a).isEmpty)
  }
}
