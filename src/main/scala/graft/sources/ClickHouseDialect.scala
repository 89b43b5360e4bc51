package graft.sources

import java.sql.Types
import java.util.Locale
import org.apache.spark.sql.jdbc.{JdbcDialect, JdbcDialects, JdbcType}
import org.apache.spark.sql.types._

/** ClickHouse JDBC dialect — the missing half of the warehouse path the
  * reference drives through `clickhouse-driver`
  * (`utils/data_acquisition.py:24-45`). [[JdbcLogSource]] supplies the
  * range-partitioned parallel fetch; this dialect teaches Spark's JDBC
  * relation ClickHouse's type algebra and identifier quoting so the
  * fetched schema lands as proper Catalyst types instead of strings.
  *
  * Everything here is derived from ClickHouse's public type documentation
  * and Spark's public `JdbcDialect` API; the mapping logic is pure and
  * unit-tested offline (`ClickHouseDialectSpec`) — no server required for
  * the dialect's correctness, only for an end-to-end smoke, which this
  * container cannot run (zero egress; documented residual).
  *
  * Type-mapping choices that matter:
  *  - `Nullable(T)` / `LowCardinality(T)` are transparent wrappers — the
  *    inner type maps, recursively (`LowCardinality(Nullable(String))`
  *    arrives in the wild). Nullability itself comes from JDBC metadata.
  *  - unsigned integers map one width UP (`UInt8`→Short, `UInt16`→Int,
  *    `UInt32`→Long) because the signed Catalyst type of the same width
  *    cannot hold the upper half of the domain; `UInt64` maps to
  *    `Decimal(20,0)` for the same reason.
  *  - `DateTime`/`DateTime64(n)` (with or without a timezone argument)
  *    map to TimestampType; ClickHouse stores both zone-less, like the
  *    reference's query_log timestamps.
  *  - `Enum8/16` surface as their string labels (what the JDBC driver
  *    returns), `FixedString(n)`/`UUID`/`IPv4`/`IPv6` as strings.
  */
object ClickHouseDialect extends JdbcDialect {

  override def canHandle(url: String): Boolean = {
    val u = url.toLowerCase(Locale.ROOT)
    u.startsWith("jdbc:clickhouse:") || u.startsWith("jdbc:ch:")
  }

  /** ClickHouse quotes identifiers with backticks (doubling embedded
    * ones), same convention as MySQL. */
  override def quoteIdentifier(colName: String): String =
    s"`${colName.replace("`", "``")}`"

  private val Wrapped = "(?:Nullable|LowCardinality)\\((.+)\\)".r
  private val ArrayRe = "Array\\((.+)\\)".r
  private val DecimalRe = "Decimal\\((\\d+)\\s*,\\s*(\\d+)\\)".r
  private val DecimalShortRe = "Decimal(32|64|128|256)\\((\\d+)\\)".r
  private val FixedStringRe = "FixedString\\((\\d+)\\)".r
  private val DateTime64Re = "DateTime64\\((\\d+)(?:\\s*,\\s*'[^']*')?\\)".r
  private val DateTimeRe = "DateTime(?:\\('[^']*'\\))?".r
  private val EnumRe = "Enum(?:8|16)\\(.*\\)".r

  /** Catalyst decimals cap at precision 38 AND require scale ≤ precision.
    * ClickHouse's Decimal256 legally reaches precision 76 / scale 76 — a
    * declared precision above 38 CANNOT be represented, and clamping it
    * (the earlier behavior) would silently null every value wider than 38
    * digits at read time under non-ANSI mode. Unrepresentable means None:
    * this dialect refuses to ASSERT a lossy mapping. What happens next
    * depends on the JDBC code the driver reports — Spark's own default
    * clamps NUMERIC/DECIMAL via `DecimalType.bounded` (so the residual
    * read may still be lossy, but that is Spark's documented fallback,
    * not a mapping this dialect vouched for) and nothing throws mid
    * schema resolution. */
  private def boundedDecimal(p: Int, s: Int): Option[DataType] =
    if (p > 38 || s > p) None else Some(DecimalType(p, s))

  /** Pure ClickHouse-type-string → Catalyst mapping (None = unknown,
    * Spark falls back to its JDBC-code-based default). */
  private[sources] def toCatalyst(raw: String): Option[DataType] =
    raw.trim match {
      case Wrapped(inner)     => toCatalyst(inner)
      case ArrayRe(inner)     => toCatalyst(inner).map(ArrayType(_))
      case DecimalRe(p, s)    => boundedDecimal(p.toInt, s.toInt)
      case DecimalShortRe(bits, s) =>
        // Decimal256's declared precision is 76, NOT a clamped 38 — the
        // earlier wildcard (`case _ => 38`) silently folded it onto
        // Decimal128 and the property suite caught the lossy mapping.
        val precision = bits match {
          case "32" => 9; case "64" => 18; case "128" => 38; case _ => 76
        }
        boundedDecimal(precision, s.toInt)
      case FixedStringRe(_)   => Some(StringType)
      case DateTime64Re(_)    => Some(TimestampType)
      case DateTimeRe()       => Some(TimestampType)
      case "Date" | "Date32"  => Some(DateType)
      case "String" | "UUID" | "IPv4" | "IPv6" => Some(StringType)
      case EnumRe()           => Some(StringType)
      case "Bool"             => Some(BooleanType)
      case "Int8"             => Some(ByteType)
      case "Int16" | "UInt8"  => Some(ShortType)
      case "Int32" | "UInt16" => Some(IntegerType)
      case "Int64" | "UInt32" => Some(LongType)
      case "UInt64"           => Some(DecimalType(20, 0))
      // 128/256-bit integers exceed Decimal(38,0)'s domain (2^127 is 39
      // digits) — the same silent-null-on-overflow hazard as a clamped
      // wide decimal, so this dialect declines to assert a lossy mapping
      // (ClickHouseDialectSpec's domain-coverage property enforces this;
      // boundedDecimal's scaladoc covers what the fallback then does).
      case "Int128" | "UInt128" | "Int256" | "UInt256" => None
      case "Float32"          => Some(FloatType)
      case "Float64"          => Some(DoubleType)
      case _                  => None
    }

  override def getCatalystType(sqlType: Int, typeName: String, size: Int,
                               md: MetadataBuilder): Option[DataType] =
    toCatalyst(typeName)

  /** Spark → ClickHouse DDL types for `createTable`/write paths.
    *
    * LIMITATION: `JdbcDialect.getJDBCType` receives only the DataType,
    * not the field's nullability, and ClickHouse columns are
    * non-nullable unless declared `Nullable(T)` — so a table CREATED
    * through this write path rejects NULL cells at insert time. Frames
    * with nullable columns that actually carry nulls need a pre-created
    * table with explicit `Nullable(...)` columns (the read path handles
    * those fine); this is a Spark dialect-API boundary, not a mapping
    * choice. */
  override def getJDBCType(dt: DataType): Option[JdbcType] = dt match {
    case StringType    => Some(JdbcType("String", Types.VARCHAR))
    case BooleanType   => Some(JdbcType("Bool", Types.BOOLEAN))
    case ByteType      => Some(JdbcType("Int8", Types.TINYINT))
    case ShortType     => Some(JdbcType("Int16", Types.SMALLINT))
    case IntegerType   => Some(JdbcType("Int32", Types.INTEGER))
    case LongType      => Some(JdbcType("Int64", Types.BIGINT))
    case FloatType     => Some(JdbcType("Float32", Types.FLOAT))
    case DoubleType    => Some(JdbcType("Float64", Types.DOUBLE))
    case DateType      => Some(JdbcType("Date", Types.DATE))
    case TimestampType => Some(JdbcType("DateTime64(6)", Types.TIMESTAMP))
    case d: DecimalType =>
      Some(JdbcType(s"Decimal(${d.precision}, ${d.scale})", Types.DECIMAL))
    case ArrayType(elem, _) =>
      getJDBCType(elem).map(inner =>
        JdbcType(s"Array(${inner.databaseTypeDefinition})", Types.ARRAY))
    case _ => None
  }

  /** ClickHouse TRUNCATE does not cascade. */
  override def isCascadingTruncateTable(): Option[Boolean] = Some(false)

  override def getTruncateQuery(table: String,
                                cascade: Option[Boolean]): String =
    s"TRUNCATE TABLE $table"

  /** Register with Spark's dialect registry (idempotent — Spark keeps the
    * most recently registered matching dialect first; re-registering the
    * same object is harmless). [[JdbcLogSource]] calls this automatically
    * for ClickHouse urls. */
  def register(): Unit = JdbcDialects.registerDialect(this)
}
