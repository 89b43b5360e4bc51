package graft.plans

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Real byte-pair-encoding token count from a pinned merges table — the
  * number a packing/sampling budget actually needs (a whitespace or
  * regex heuristic silently misbudgets real corpora; see
  * `Packing`/`Sampling.mixtureSample`).
  *
  * Algorithm: GPT-2-shaped — pre-tokenize with `Text.BpeTokenRe`, then
  * per pre-token start from single code-point symbols and apply the
  * merges IN RANK ORDER, each rule merging all its adjacent occurrences
  * left-to-right non-overlapping. For a WELL-FORMED merges table (every
  * composite symbol introduced by an earlier rule before use — validated
  * at load, `graft.functions.Bpe.loadMerges`) this sequential pass is
  * equivalent to the classic lowest-rank-first priority loop: a merge can
  * only create adjacencies involving its own output symbol, and every
  * rule consuming that symbol necessarily ranks later.
  *
  * The merges table rides inside the expression (task-serialized — the
  * broadcast-equivalent for a vocabulary of merge rules; real BPE tables
  * are ≤50k lines, a few hundred KB). Codegen stays in the whole-stage
  * pipeline via an `addReferenceObj` call — one virtual call per row, no
  * interpreted fallback.
  */
case class BpeTokenCount(child: Expression, merges: Seq[(String, String)])
    extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "bpe_token_count"

  @transient private lazy val encoder = new BpeTokenCount.Encoder(merges)

  override def nullSafeEval(input: Any): Any =
    encoder.countTokens(input.asInstanceOf[UTF8String].toString)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bpeEncoder", encoder,
      classOf[BpeTokenCount.Encoder].getName)
    defineCodeGen(ctx, ev, c => s"$ref.countTokens($c.toString())")
  }

  override protected def withNewChildInternal(newChild: Expression): BpeTokenCount =
    copy(child = newChild)
}

object BpeTokenCount {

  /** Compiled rule table + per-row encoder; shipped to executors once per
    * task via the expression's reference object. */
  final class Encoder(merges: Seq[(String, String)]) extends Serializable {
    private val xs = merges.map(_._1).toArray
    private val ys = merges.map(_._2).toArray
    private val outs = merges.map(m => m._1 + m._2).toArray
    @transient private lazy val preTokenRe =
      java.util.regex.Pattern.compile(graft.functions.Text.BpeTokenRe)

    def countTokens(text: String): Long = {
      var total = 0L
      val m = preTokenRe.matcher(text)
      while (m.find()) total += encodeCount(m.group())
      total
    }

    /** Full-text symbol sequence: pre-tokens encoded in order. */
    def tokenize(text: String): java.util.ArrayList[String] = {
      val out = new java.util.ArrayList[String]()
      val m = preTokenRe.matcher(text)
      while (m.find()) out.addAll(encode(m.group()))
      out
    }

    /** Symbol count after all merges for ONE pre-token. */
    private[plans] def encodeCount(tok: String): Int = encode(tok).size

    /** Symbol sequence after all merges for ONE pre-token. */
    private[plans] def encode(tok: String): java.util.ArrayList[String] = {
      var syms = new java.util.ArrayList[String](tok.length)
      var i = 0
      while (i < tok.length) { // code points, not chars: non-BMP safe
        val n = Character.charCount(tok.codePointAt(i))
        syms.add(tok.substring(i, i + n))
        i += n
      }
      var r = 0
      while (r < xs.length && syms.size > 1) {
        val x = xs(r); val y = ys(r)
        // merge-all, left-to-right non-overlapping; copy lazily so rules
        // that never fire (the common case) allocate nothing
        var out: java.util.ArrayList[String] = null
        var j = 0
        while (j < syms.size) {
          if (j + 1 < syms.size && syms.get(j) == x && syms.get(j + 1) == y) {
            if (out == null) {
              out = new java.util.ArrayList[String](syms.size)
              var k = 0
              while (k < j) { out.add(syms.get(k)); k += 1 }
            }
            out.add(outs(r))
            j += 2
          } else {
            if (out != null) out.add(syms.get(j))
            j += 1
          }
        }
        if (out != null) syms = out
        r += 1
      }
      syms
    }
  }

  def count(c: Column, merges: Seq[(String, String)]): Column =
    GraftSqlBridge.column(BpeTokenCount(GraftSqlBridge.expression(c), merges))

  def tokens(c: Column, merges: Seq[(String, String)]): Column =
    GraftSqlBridge.column(BpeTokens(GraftSqlBridge.expression(c), merges))
}

/** The symbol SEQUENCE the same encoder produces — the actual
  * tokenization surface (token counting is its cardinality). Same
  * sequential rank-order algorithm, same equivalence argument, same
  * codegen shape as [[BpeTokenCount]]. */
case class BpeTokens(child: Expression, merges: Seq[(String, String)])
    extends UnaryExpression {
  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.StringType, containsNull = false)
  override def prettyName: String = "bpe_tokens"

  @transient private lazy val encoder = new BpeTokenCount.Encoder(merges)

  override def nullSafeEval(input: Any): Any =
    BpeTokens.toArrayData(encoder.tokenize(input.asInstanceOf[UTF8String].toString))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bpeEncoder", encoder,
      classOf[BpeTokenCount.Encoder].getName)
    defineCodeGen(ctx, ev,
      c => s"graft.plans.BpeTokens.toArrayData($ref.tokenize($c.toString()))")
  }

  override protected def withNewChildInternal(newChild: Expression): BpeTokens =
    copy(child = newChild)
}

object BpeTokens {
  def toArrayData(syms: java.util.ArrayList[String])
      : org.apache.spark.sql.catalyst.util.GenericArrayData = {
    val out = new Array[Any](syms.size)
    var i = 0
    while (i < syms.size) { out(i) = UTF8String.fromString(syms.get(i)); i += 1 }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }
}
