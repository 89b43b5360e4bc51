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
    assert(cat("Decimal32(2)").contains(DecimalType(9, 2)))
    assert(cat("Decimal64(4)").contains(DecimalType(18, 4)))
    assert(cat("Decimal128(6)").contains(DecimalType(38, 6)))
    // precision beyond Catalyst's 38 cannot be represented — clamping
    // would silently null >38-digit values at read time, so these must
    // fall back (None), never throw mid schema resolution
    assert(cat("Decimal(76, 4)").isEmpty)
    assert(cat("Decimal(76, 40)").isEmpty)
    assert(cat("Decimal256(40)").isEmpty)
    assert(cat("Decimal256(76)").isEmpty)
    assert(cat("Decimal256(0)").isEmpty)
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

  // ------------- property tests over the documented type grammar -------
  // Generators draw from ClickHouse's published type grammar (base types,
  // Decimal(p,s) and DecimalNN(s) short forms, DateTime64(p[, tz]),
  // FixedString(n), Enum8/16, with Nullable / LowCardinality / Array
  // nesting); each sample carries an independently-constructed expected
  // Catalyst type, so the assertion is model-based equality, not a
  // re-derivation through the code under test. Deterministic seeds keep
  // failures reproducible.

  import org.scalacheck.Gen
  import org.scalacheck.rng.Seed

  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    (0 until n).map(i => g.pureApply(Gen.Parameters.default, Seed(42L + i)))

  private val fixedScalars: Seq[(String, Option[DataType])] = Seq(
    "Int8" -> Some(ByteType), "Int16" -> Some(ShortType),
    "Int32" -> Some(IntegerType), "Int64" -> Some(LongType),
    "UInt8" -> Some(ShortType), "UInt16" -> Some(IntegerType),
    "UInt32" -> Some(LongType), "UInt64" -> Some(DecimalType(20, 0)),
    "Int128" -> None, "UInt128" -> None, "Int256" -> None, "UInt256" -> None,
    "Float32" -> Some(FloatType), "Float64" -> Some(DoubleType),
    "String" -> Some(StringType), "UUID" -> Some(StringType),
    "IPv4" -> Some(StringType), "IPv6" -> Some(StringType),
    "Bool" -> Some(BooleanType), "Date" -> Some(DateType),
    "Date32" -> Some(DateType), "DateTime" -> Some(TimestampType),
    "Tuple(Int32, String)" -> None, "Map(String, Int64)" -> None,
    "AggregateFunction(sum, Int64)" -> None)

  private val scalarGen: Gen[(String, Option[DataType])] = Gen.oneOf(
    Gen.oneOf(fixedScalars),
    Gen.choose(0, 9).map(p => s"DateTime64($p)" -> Some(TimestampType))
      : Gen[(String, Option[DataType])],
    for {
      p <- Gen.choose(0, 9)
      tz <- Gen.oneOf("UTC", "Europe/Berlin", "America/New_York")
    } yield s"DateTime64($p, '$tz')" -> Some(TimestampType),
    Gen.oneOf("UTC", "Asia/Tokyo").map(tz =>
      s"DateTime('$tz')" -> Some(TimestampType)),
    Gen.choose(1, 256).map(n => s"FixedString($n)" -> Some(StringType)),
    for { p <- Gen.choose(1, 76); s <- Gen.choose(0, p) } yield
      s"Decimal($p, $s)" ->
        (if (p <= 38) Some(DecimalType(p, s)): Option[DataType] else None),
    for {
      bp <- Gen.oneOf((32, 9), (64, 18), (128, 38), (256, 76))
      s <- Gen.choose(0, bp._2)
    } yield s"Decimal${bp._1}($s)" ->
      (if (bp._2 <= 38) Some(DecimalType(bp._2, s)): Option[DataType] else None),
    Gen.oneOf("Enum8('a' = 1, 'b' = 2)", "Enum16('x' = -1, 'y' = 300)")
      .map(_ -> (Some(StringType): Option[DataType])))

  /** Random wrapper/array nesting with the model built alongside. */
  private def typeGen(depth: Int): Gen[(String, Option[DataType])] =
    if (depth == 0) scalarGen
    else Gen.frequency(
      3 -> scalarGen,
      1 -> Gen.lzy(typeGen(depth - 1)).map { case (t, e) =>
        s"Nullable($t)" -> e },
      1 -> Gen.lzy(typeGen(depth - 1)).map { case (t, e) =>
        s"LowCardinality($t)" -> e },
      2 -> Gen.lzy(typeGen(depth - 1)).map { case (t, e) =>
        s"Array($t)" -> e.map(ArrayType(_)) })

  test("property: every grammar type maps to its model (or falls back), never throws") {
    samples(typeGen(3), 800).foreach { case (t, expected) =>
      assert(cat(t) == expected, s"type $t")
    }
  }

  test("property: Nullable and LowCardinality are transparent at any nesting level") {
    samples(typeGen(2), 300).foreach { case (t, _) =>
      assert(cat(s"Nullable($t)") == cat(t), s"Nullable over $t")
      assert(cat(s"LowCardinality($t)") == cat(t), s"LowCardinality over $t")
      assert(cat(s"Array($t)") == cat(t).map(ArrayType(_)), s"Array over $t")
    }
  }

  test("property: write-side DDL round-trips through the read mapping losslessly") {
    val writeScalar: Gen[DataType] = Gen.oneOf(
      Gen.oneOf[DataType](StringType, BooleanType, ByteType, ShortType,
        IntegerType, LongType, FloatType, DoubleType, DateType,
        TimestampType),
      for { p <- Gen.choose(1, 38); s <- Gen.choose(0, p) }
        yield DecimalType(p, s): DataType)
    val writeType: Gen[DataType] = Gen.frequency(
      3 -> writeScalar,
      1 -> writeScalar.map(ArrayType(_)),
      1 -> writeScalar.map(e => ArrayType(ArrayType(e))))
    samples(writeType, 400).foreach { t =>
      val ddl = ClickHouseDialect.getJDBCType(t)
        .getOrElse(fail(s"no DDL for $t")).databaseTypeDefinition
      assert(cat(ddl).contains(t), s"$t -> $ddl -> ${cat(ddl)}")
    }
  }

  test("every integer mapping covers the full ClickHouse domain (no silent overflow)") {
    def catalystRange(dt: DataType): (BigInt, BigInt) = dt match {
      case ByteType => (BigInt(Byte.MinValue), BigInt(Byte.MaxValue))
      case ShortType => (BigInt(Short.MinValue), BigInt(Short.MaxValue))
      case IntegerType => (BigInt(Int.MinValue), BigInt(Int.MaxValue))
      case LongType => (BigInt(Long.MinValue), BigInt(Long.MaxValue))
      case d: DecimalType if d.scale == 0 =>
        val m = BigInt(10).pow(d.precision) - 1; (-m, m)
      case other => fail(s"unexpected integer mapping $other")
    }
    def chRange(bits: Int, signed: Boolean): (BigInt, BigInt) =
      if (signed) (-(BigInt(2).pow(bits - 1)), BigInt(2).pow(bits - 1) - 1)
      else (BigInt(0), BigInt(2).pow(bits) - 1)
    for {
      bits <- Seq(8, 16, 32, 64, 128, 256)
      signed <- Seq(true, false)
    } {
      val name = (if (signed) "Int" else "UInt") + bits
      val (lo, hi) = chRange(bits, signed)
      cat(name) match {
        case Some(dt) =>
          val (clo, chi) = catalystRange(dt)
          assert(clo <= lo && hi <= chi, s"$name -> $dt loses range")
        case None =>
          // falling back is legitimate ONLY when no Catalyst integer or
          // Decimal(38,0) can hold the domain — i.e. 128-bit and wider
          assert(hi > BigInt(10).pow(38) - 1, s"$name fell back needlessly")
      }
    }
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
