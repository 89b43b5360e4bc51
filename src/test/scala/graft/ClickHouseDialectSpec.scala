package graft

import graft.sources.ClickHouseDialect
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Offline dialect correctness: type algebra, quoting, DDL generation.
  * (An end-to-end smoke needs a live ClickHouse — impossible in this
  * container; the mapping logic is the part a server can't vary.) */
class ClickHouseDialectSpec extends AnyFunSuite {

  private def cat(t: String): Option[DataType] =
    ClickHouseDialect.getCatalystType(java.sql.Types.OTHER, t, 0,
      new MetadataBuilder)

  test("url matching covers both official driver prefixes") {
    assert(ClickHouseDialect.canHandle("jdbc:clickhouse://host:8123/db"))
    assert(ClickHouseDialect.canHandle("jdbc:ch://host:8123/db"))
    assert(ClickHouseDialect.canHandle("JDBC:ClickHouse://host/db"))
    assert(!ClickHouseDialect.canHandle("jdbc:postgresql://host/db"))
    assert(!ClickHouseDialect.canHandle("jdbc:derby:memory:db"))
  }

  test("scalar type mapping: integers widen, floats/dates/strings map direct") {
    assert(cat("Int8").contains(ByteType))
    assert(cat("Int16").contains(ShortType))
    assert(cat("Int32").contains(IntegerType))
    assert(cat("Int64").contains(LongType))
    // unsigned: one width up — the same-width signed type can't hold it
    assert(cat("UInt8").contains(ShortType))
    assert(cat("UInt16").contains(IntegerType))
    assert(cat("UInt32").contains(LongType))
    assert(cat("UInt64").contains(DecimalType(20, 0)))
    assert(cat("Float32").contains(FloatType))
    assert(cat("Float64").contains(DoubleType))
    assert(cat("String").contains(StringType))
    assert(cat("FixedString(16)").contains(StringType))
    assert(cat("UUID").contains(StringType))
    assert(cat("Bool").contains(BooleanType))
    assert(cat("Date").contains(DateType))
    assert(cat("Date32").contains(DateType))
    assert(cat("Enum8('a' = 1, 'b' = 2)").contains(StringType))
    assert(cat("TotallyUnknownType").isEmpty)
  }

  test("datetime variants all land on TimestampType") {
    assert(cat("DateTime").contains(TimestampType))
    assert(cat("DateTime('UTC')").contains(TimestampType))
    assert(cat("DateTime64(3)").contains(TimestampType))
    assert(cat("DateTime64(6, 'Europe/Berlin')").contains(TimestampType))
  }

  test("decimals: explicit precision, short forms, and the 38 cap") {
    assert(cat("Decimal(10, 2)").contains(DecimalType(10, 2)))
    assert(cat("Decimal(76, 4)").contains(DecimalType(38, 4))) // capped
    assert(cat("Decimal32(2)").contains(DecimalType(9, 2)))
    assert(cat("Decimal64(4)").contains(DecimalType(18, 4)))
    assert(cat("Decimal128(6)").contains(DecimalType(38, 6)))
    // scale that outlives the 38-precision cap cannot be represented —
    // must fall back (None), never throw mid schema resolution
    assert(cat("Decimal(76, 40)").isEmpty)
    assert(cat("Decimal256(40)").isEmpty)
    assert(cat("Decimal256(76)").isEmpty)
  }

  test("wrappers unwrap recursively; arrays nest") {
    assert(cat("Nullable(Int64)").contains(LongType))
    assert(cat("LowCardinality(String)").contains(StringType))
    assert(cat("LowCardinality(Nullable(String))").contains(StringType))
    assert(cat("Array(String)").contains(ArrayType(StringType)))
    assert(cat("Array(Nullable(UInt32))").contains(ArrayType(LongType)))
    assert(cat("Array(Array(Int32))")
      .contains(ArrayType(ArrayType(IntegerType))))
  }

  test("write-side DDL types round-trip the query_log shapes") {
    def ddl(dt: DataType): String =
      ClickHouseDialect.getJDBCType(dt).get.databaseTypeDefinition
    assert(ddl(StringType) == "String")
    assert(ddl(LongType) == "Int64")
    assert(ddl(TimestampType) == "DateTime64(6)")
    assert(ddl(DecimalType(20, 0)) == "Decimal(20, 0)")
    assert(ddl(ArrayType(StringType)) == "Array(String)")
    assert(ddl(ArrayType(LongType)) == "Array(Int64)")
  }

  test("identifier quoting doubles embedded backticks; truncate does not cascade") {
    assert(ClickHouseDialect.quoteIdentifier("col") == "`col`")
    assert(ClickHouseDialect.quoteIdentifier("we`ird") == "`we``ird`")
    assert(ClickHouseDialect.getTruncateQuery("db.t", Some(true)) == "TRUNCATE TABLE db.t")
    assert(ClickHouseDialect.isCascadingTruncateTable().contains(false))
    ClickHouseDialect.register() // idempotent, must not throw
    ClickHouseDialect.register()
  }
}
