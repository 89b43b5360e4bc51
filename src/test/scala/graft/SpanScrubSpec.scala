package graft

import graft.plans.JoinTokensExcept
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Parity pins for the r19 scrub-reassembly kernel (SpanScrub scaladoc):
  * [[JoinTokensExcept]] must reproduce the verbatim pre-r19 composable
  * form — `when(rem NULL, join all).otherwise(join(filter(!contains)))`
  * — element for element, including the null algebra the lambda form
  * implied (toks NULL → NULL; rem NULL → all tokens; a null element in
  * rem poisons the contains probe and drops every token; out-of-range
  * positions are no-ops; null tokens are join-skipped with no
  * separator), for both separators the call sites use (" " and "\n"). */
class SpanScrubSpec extends SparkSpec {

  // ---- the pre-r19 composable form, verbatim (Dedup reassembly sites) ----
  private def oldForm(toks: Column, rem: Column, sep: String): Column =
    when(rem.isNull, array_join(toks, sep))
      .otherwise(array_join(filter(toks,
        (_, i) => !array_contains(rem, i)), sep))

  private val fixtureSql = Seq(
    // (toks, rem) adversarial fixtures as SQL expressions
    ("array('a','b','c','d')", "array(1, 3)"),
    ("array('a','b','c','d')", "cast(null as array<int>)"),
    ("array('a','b','c')", "array(0, 1, 2)"), // everything removed
    ("array('a','b','c')", "array()"), // nothing removed
    ("array('a','b','c')", "array(-1, 5, 99)"), // out of range: no-ops
    ("array('a', cast(null as string), 'c')", "array(2)"), // null token kept-path
    ("array('a', cast(null as string), 'c')", "cast(null as array<int>)"),
    ("cast(null as array<string>)", "array(1)"), // toks null → null
    ("cast(null as array<string>)", "cast(null as array<int>)"),
    ("array('a','b','c')", "array(1, cast(null as int))"), // poisoned rem
    ("array()", "array(0)"), // empty toks
    ("array('x')", "array(0)"), // single token removed → empty string
    ("array('', 'b', '')", "array(1)"), // empty-string tokens survive
    ("array('a','b','c','d','e')", "array(4, 0, 2)"), // unsorted rem
    ("array('a','b')", "array(0, 0, 1, 1)")) // duplicate positions

  test("kernel == verbatim composable form on the full null algebra") {
    for (sep <- Seq(" ", "\n");
         ((t, r), i) <- fixtureSql.zipWithIndex) {
      val df = spark.sql(s"SELECT $t AS toks, $r AS rem")
      val got = df.select(
        JoinTokensExcept.joinExcept(col("toks"), col("rem"), sep).as("v"),
        oldForm(col("toks"), col("rem"), sep).as("exp")).collect()(0)
      assert(got.isNullAt(0) == got.isNullAt(1),
        s"fixture $i ($t, $r, sep=${sep.hashCode}): null mismatch $got")
      if (!got.isNullAt(0))
        assert(got.getString(0) == got.getString(1),
          s"fixture $i ($t, $r): '${got.getString(0)}' != '${got.getString(1)}'")
    }
  }

  test("kernel matches old form over the real span pipeline's frame shape") {
    // derived-from-corpus shape: 0-based positions from sequence(), ints,
    // distinct — exactly what removeMaximalSpans feeds the projection
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
      .limit(200)
      .selectExpr("doc_id",
        "split(lower(text), ' ') AS toks",
        // deterministic pseudo-removal set: every 3rd position of the
        // doc's own index space, null for every 4th doc (the left-join
        // miss case)
        """CASE WHEN doc_id % 4 = 0 THEN cast(null as array<int>)
           ELSE filter(sequence(0, size(split(lower(text), ' ')) - 1),
                       p -> p % 3 = 0) END AS rem""")
    val both = docs.select(
      JoinTokensExcept.joinExcept(col("toks"), col("rem")).as("v"),
      oldForm(col("toks"), col("rem"), " ").as("exp"))
    assert(both.filter(!(col("v") <=> col("exp"))).count() == 0)
  }

  test("interpreted eval path agrees with codegen on the basic case") {
    val df = spark.sql(
      "SELECT array('a','b','c','d') AS toks, array(1,3) AS rem")
    val row = df.select(
      JoinTokensExcept.joinExcept(col("toks"), col("rem"))).collect()(0)
    assert(row.getString(0) == "a c")
    // direct Expression.eval (the interpreted path, bypassing codegen)
    import org.apache.spark.sql.catalyst.expressions.{BoundReference, Literal}
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    import org.apache.spark.sql.catalyst.InternalRow
    import org.apache.spark.sql.types._
    import org.apache.spark.unsafe.types.UTF8String
    val toksArr = new GenericArrayData(Array[Any](
      UTF8String.fromString("a"), UTF8String.fromString("b"),
      UTF8String.fromString("c"), UTF8String.fromString("d")))
    val remArr = new GenericArrayData(Array[Any](1, 3))
    val e = graft.plans.JoinTokensExcept(
      BoundReference(0, ArrayType(StringType), nullable = true),
      BoundReference(1, ArrayType(IntegerType), nullable = true), " ")
    val out = e.eval(InternalRow(toksArr, remArr))
    assert(out.toString == "a c")
    assert(e.eval(InternalRow(null, remArr)) == null)
    assert(e.eval(InternalRow(toksArr, null)).toString == "a b c d")
  }
}
