package graft.plans

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** All four Gopher repetition statistics of a token array in ONE pass —
  * `struct<n_tokens, n_distinct_tokens, top_bigram, top_bigram_count,
  * dup_trigram_frac>` — replacing the composed form that materialized the
  * bigram AND trigram shingle arrays (a byte-copying `array_join` per
  * occurrence) and ran two `array_distinct` hash passes on top
  * ([[graft.operators.Repetition.ngramRepetitionComposed]], kept as the
  * property-test twin). Semantics are bit-identical to the composed form,
  * including its [[graft.functions.Text.shinglesFromTokens]] degenerate
  * convention (fewer tokens than the gram order ⇒ one whole-text shingle)
  * and [[TopGram]]'s tie-break (highest count, then binary-smallest gram).
  *
  * The hot loop allocates no gram strings: bigrams count under a reusable
  * probe key holding two `UTF8String` refs into the row buffer (stable
  * within one eval), trigram distinctness is a ref-triple set, and the
  * space-joined bigram text is built only for argmax candidates during the
  * final map scan. Tokens come from a `\s+` split so they contain no
  * whitespace and the pair→joined-string map is injective; the tie-break
  * still compares the JOINED bytes, exactly like the composed form, so
  * exotic sub-0x20 token bytes cannot diverge. Per-document memory is
  * bounded by the document's own distinct-gram count — the same bound the
  * composed `array_distinct` form already paid.
  */
case class RepetitionStats(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StructType(Seq(
    StructField("n_tokens", LongType, nullable = true),
    StructField("n_distinct_tokens", LongType, nullable = true),
    StructField("top_bigram", StringType, nullable = true),
    StructField("top_bigram_count", LongType, nullable = true),
    StructField("dup_trigram_frac", DoubleType, nullable = true)))
  override def prettyName: String = "repetition_stats"

  override def nullSafeEval(input: Any): Any =
    RepetitionStats.compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.RepetitionStats.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): RepetitionStats =
    copy(child = newChild)
}

object RepetitionStats {
  private val Space = UTF8String.fromString(" ")

  /** Mutable pair key: one probe instance serves every map lookup; a fresh
    * copy is allocated only on first insertion of a gram. */
  private final class G2(var a: UTF8String, var b: UTF8String) {
    override def hashCode: Int =
      31 * (if (a == null) 0 else a.hashCode) + (if (b == null) 0 else b.hashCode)
    override def equals(o: Any): Boolean = {
      val g = o.asInstanceOf[G2]
      (if (a == null) g.a == null else a.equals(g.a)) &&
        (if (b == null) g.b == null else b.equals(g.b))
    }
  }

  private final class G3(var a: UTF8String, var b: UTF8String, var c: UTF8String) {
    override def hashCode: Int =
      31 * (31 * (if (a == null) 0 else a.hashCode) +
        (if (b == null) 0 else b.hashCode)) + (if (c == null) 0 else c.hashCode)
    override def equals(o: Any): Boolean = {
      val g = o.asInstanceOf[G3]
      (if (a == null) g.a == null else a.equals(g.a)) &&
        (if (b == null) g.b == null else b.equals(g.b)) &&
        (if (c == null) g.c == null else c.equals(g.c))
    }
  }

  /** `array_join(_, " ")` semantics: null elements skipped, no separator. */
  private def join2(a: UTF8String, b: UTF8String): UTF8String =
    if (a == null) { if (b == null) UTF8String.EMPTY_UTF8 else b }
    else if (b == null) a
    else UTF8String.concat(a, Space, b)

  private def joinAll(toks: ArrayData): UTF8String = {
    val n = toks.numElements()
    val parts = new java.util.ArrayList[UTF8String](n)
    var i = 0
    while (i < n) {
      if (!toks.isNullAt(i)) {
        if (!parts.isEmpty) parts.add(Space)
        parts.add(toks.getUTF8String(i))
      }
      i += 1
    }
    if (parts.isEmpty) UTF8String.EMPTY_UTF8
    else UTF8String.concat(parts.toArray(new Array[UTF8String](parts.size)): _*)
  }

  def compute(toks: ArrayData): InternalRow = {
    val n = toks.numElements()

    // unigrams: total + distinct (array_distinct counts a null once)
    val uniq = new java.util.HashSet[UTF8String](math.max(8, n))
    var sawNull = false
    var i = 0
    while (i < n) {
      if (toks.isNullAt(i)) sawNull = true else uniq.add(toks.getUTF8String(i))
      i += 1
    }
    val nDistinct = uniq.size.toLong + (if (sawNull) 1L else 0L)

    // bigrams: count per pair, then argmax by (count desc, joined-bytes asc)
    var topBigram: UTF8String = null
    var topCount = 0L
    if (n - 1 <= 0) { // shinglesFromTokens degenerate: one whole-text shingle
      topBigram = joinAll(toks)
      topCount = 1L
    } else {
      val counts = new java.util.HashMap[G2, Array[Long]](math.max(8, n))
      val probe = new G2(null, null)
      i = 0
      while (i < n - 1) {
        probe.a = if (toks.isNullAt(i)) null else toks.getUTF8String(i)
        probe.b = if (toks.isNullAt(i + 1)) null else toks.getUTF8String(i + 1)
        val slot = counts.get(probe)
        if (slot == null) counts.put(new G2(probe.a, probe.b), Array(1L))
        else slot(0) += 1L
        i += 1
      }
      val it = counts.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        val c = e.getValue()(0)
        if (c > topCount) {
          topCount = c
          topBigram = join2(e.getKey.a, e.getKey.b)
        } else if (c == topCount) {
          val j = join2(e.getKey.a, e.getKey.b)
          if (j.compareTo(topBigram) < 0) topBigram = j
        }
      }
    }

    // trigrams: occurrence total vs distinct count — (total−distinct)/total
    val dupFrac: Double =
      if (n - 2 <= 0) 0.0 // one degenerate shingle: (1−1)/1
      else {
        val seen = new java.util.HashSet[G3](math.max(8, n))
        val probe = new G3(null, null, null)
        var distinct = 0
        i = 0
        while (i < n - 2) {
          probe.a = if (toks.isNullAt(i)) null else toks.getUTF8String(i)
          probe.b = if (toks.isNullAt(i + 1)) null else toks.getUTF8String(i + 1)
          probe.c = if (toks.isNullAt(i + 2)) null else toks.getUTF8String(i + 2)
          if (!seen.contains(probe)) {
            seen.add(new G3(probe.a, probe.b, probe.c))
            distinct += 1
          }
          i += 1
        }
        val total = (n - 2).toDouble
        (total - distinct) / total
      }

    // clone the winner: its bytes may point into a reused UnsafeRow buffer
    new GenericInternalRow(Array[Any](n.toLong, nDistinct,
      if (topBigram == null) null else topBigram.clone(), topCount, dupFrac))
  }

  def repetitionStats(c: Column): Column =
    GraftSqlBridge.column(RepetitionStats(GraftSqlBridge.expression(c)))
}
