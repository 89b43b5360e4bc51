package graft

import graft.functions.{Normalize, NormalizeImpl}
import graft.plans.NormalizeQueryExpr.normalizeQueryNative
import org.apache.spark.sql.functions._
import scala.util.Random

/** The native one-pass scanner must be EXACTLY the regex chain — pattern
  * identity depends on it (SURVEY.md §7.4 #2). Property-tested against
  * the same Java regexes Spark's regexp_replace uses, plus a DataFrame
  * cross-check of expression vs chain on real corpus data. */
class NormalizeNativeSpec extends SparkSpec {
  import spark.implicits._

  private def chain(s: String): String =
    s.toLowerCase(java.util.Locale.ROOT)
      .replaceAll(Normalize.LiteralRe, "?")
      .replaceAll(Normalize.NumberRe, "n")
      .replaceAll(Normalize.SpaceRe, " ")
      .trim

  test("scanner equals the regex chain on handcrafted edge cases") {
    val cases = Seq(
      "", "   ", "'", "''", "'''", "''''", "a''b", "9'x", "'9", "x'9'y",
      "12'x'34", "1'x'a", "SELECT * FROM t WHERE a = 42 AND s = 'x 9 y'",
      "a_1 b1c 12_ _12 1-2 1?2", "tab\there\nnewlinevt\fff\rcr",
      "digits123inside", "123", " 1 ", "'unclosed 123", "x = '99 bottles' AND y = 99",
      "db1.t2 JOIN x9", "?5? '5' 5", "a  b   c", "'a'5'b'", "5'a'5")
    cases.foreach { s =>
      assert(NormalizeImpl.normalize(s) == chain(s), s"input: <$s>")
    }
  }

  test("scanner equals the regex chain on 20k random strings") {
    val alphabet = "ab z01239'\"_-?.,()= \t\n\f\r" + "SELECT FROM where"
    val rnd = new Random(42)
    (1 to 20000).foreach { _ =>
      val s = (0 until rnd.nextInt(40)).map(_ =>
        alphabet(rnd.nextInt(alphabet.length))).mkString
      assert(NormalizeImpl.normalize(s) == chain(s), s"input: <$s>")
    }
  }

  test("native expression equals the composable chain on the corpus") {
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
    val ev = graft.sources.Tables.events(spark, sf0001)
      .withColumn("q", concat(col("event_type"), lit(" "), col("props")))
    for ((df, c) <- Seq((docs, col("text")), (ev, col("q")))) {
      val diff = df.select(
        normalizeQueryNative(c).as("native"),
        Normalize.normalizeQueryComposed(c).as("chain"))
        .filter(col("native") =!= col("chain"))
      assert(diff.count() == 0)
    }
  }

  test("null-safe") {
    val got = Seq[Option[String]](None, Some("x 1")).toDF("s")
      .select(normalizeQueryNative(col("s"))).collect()
    assert(got(0).isNullAt(0))
    assert(got(1).getString(0) == "x n")
  }
}
