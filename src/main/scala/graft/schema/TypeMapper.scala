package graft.schema

import org.apache.spark.sql.types._

/**
 * Source-catalog column description, mirroring what the reference pulls from
 * `information_schema` (`/root/reference/postgres.go:166-178`: column_name,
 * udt_name, is_nullable, ordinal_position, data_type, numeric_precision,
 * numeric_scale, ...).
 */
final case class SourceColumn(
    name: String,
    udtName: String,
    nullable: Boolean = true,
    ordinalPosition: Int = 0,
    numericPrecision: Option[Int] = None,
    numericScale: Option[Int] = None)

/**
 * PostgreSQL `udt_name` → Spark `DataType` mapping.
 *
 * Re-expresses the reference's `pgSchemaToBqSchema`
 * (`/root/reference/bigquery.go:252-364`) against Spark's type system, with
 * the documented divergences from SURVEY §1.3:
 *
 *  - arrays (`_*` udt names) stay native `ArrayType` instead of being
 *    degraded to JSON strings (the reference's Benthos limitation,
 *    `bigquery.go:274`);
 *  - float4/float8 map to Float/Double, NOT decimal — the reference's
 *    float→NUMERIC (with scale overwriting precision, `bigquery.go:291`)
 *    is a bug we do not reproduce;
 *  - `numeric` keeps both precision AND scale (`bigquery.go:327` drops the
 *    distinction).
 */
object TypeMapper {

  def toSparkType(c: SourceColumn): DataType = {
    val u = c.udtName.toLowerCase
    u match {
      // arrays: `_text`, `_int4`, ... (`/root/reference/postgres.go:59`)
      case a if a.startsWith("_") =>
        ArrayType(scalarType(c.copy(udtName = a.drop(1))), containsNull = true)
      // `int2vector`/`oidvector`/`tsvector` (`/root/reference/postgres.go:60`,
      // `bigquery.go:281`): the reference JSON-stringifies; we keep arrays for
      // the numeric vectors and a string for tsvector's lexeme text.
      case "int2vector"           => ArrayType(ShortType, containsNull = false)
      case "oidvector"            => ArrayType(LongType, containsNull = false)
      case v if v.endsWith("vector") => StringType
      case _ => scalarType(c)
    }
  }

  private def scalarType(c: SourceColumn): DataType = c.udtName.toLowerCase match {
    case "float4"                         => FloatType
    case "float8"                         => DoubleType
    case "int2"                           => ShortType
    case "int4"                           => IntegerType
    // `int*` not ending "erval" → integer (`/root/reference/bigquery.go:295`)
    case "int8"                           => LongType
    case "numeric" =>
      DecimalType(
        c.numericPrecision.getOrElse(DecimalType.MAX_PRECISION),
        c.numericScale.getOrElse(18))
    case "bool"                           => BooleanType
    case "bytea"                          => BinaryType
    case "date"                           => DateType
    case "abstime"                        => TimestampNTZType // BQ DATETIME analog
    case "timestamp" | "timestamptz"      => TimestampType
    case "oid" | "xid"                    => LongType
    case "json" | "jsonb"                 => StringType
    // char/varchar/text/name/inet/ltree/regproc/point/interval and the
    // default branch (`/root/reference/bigquery.go:347-348`) → STRING
    case _                                => StringType
  }

  def toStructField(c: SourceColumn): StructField =
    StructField(c.name, toSparkType(c), c.nullable)

  /** Full-table schema in catalog (ordinal) order — the reference always
    * projects every column explicitly, never `SELECT *`
    * (`/root/reference/postgres.go:49,62-66`). */
  def toStructType(cols: Seq[SourceColumn]): StructType =
    StructType(cols.sortBy(_.ordinalPosition).map(toStructField))

  // --- schema cache round-trip (replaces the SQLite JSON text cache,
  // --- `/root/reference/nmsdb.go:147-151`) ---

  def schemaToJson(s: StructType): String = s.json

  def schemaFromJson(json: String): StructType =
    DataType.fromJson(json).asInstanceOf[StructType]

  // --- drift detection (replaces compareBQSchemas deep-equal,
  // --- `/root/reference/bigquery.go:115-121`) ---

  final case class SchemaDrift(
      added: Seq[StructField],
      removed: Seq[StructField],
      changed: Seq[(StructField, StructField)]) {
    def isEmpty: Boolean = added.isEmpty && removed.isEmpty && changed.isEmpty
  }

  def drift(cached: StructType, live: StructType): SchemaDrift = {
    val cachedByName = cached.fields.map(f => f.name -> f).toMap
    val liveByName = live.fields.map(f => f.name -> f).toMap
    SchemaDrift(
      added = live.fields.toSeq.filterNot(f => cachedByName.contains(f.name)),
      removed = cached.fields.toSeq.filterNot(f => liveByName.contains(f.name)),
      changed = cached.fields.toSeq.flatMap { f =>
        liveByName.get(f.name) match {
          case Some(l) if l.dataType != f.dataType || l.nullable != f.nullable =>
            Some((f, l))
          case _ => None
        }
      })
  }
}
