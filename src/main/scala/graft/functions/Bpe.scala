package graft.functions

import org.apache.spark.sql.Column

/** Merges-file loading + Column/oracle surface for real BPE token
  * counting ([[graft.plans.BpeTokenCount]]).
  *
  * The DuckDB twin mirrors the encoder exactly without any tokenizer
  * library, by exploiting two identities:
  *  - joining symbols as `SEP || symbol` (SEP = chr(1), never in text)
  *    makes "merge all adjacent (x,y) left-to-right non-overlapping"
  *    literally `replace(s, SEP||x||SEP||y, SEP||xy)` — string replace
  *    has exactly those semantics;
  *  - pre-token boundaries become chr(2) markers, which no pattern can
  *    cross (symbols never contain chr(2)).
  * The oracle is then a generated chain of one `replace` per merge rule,
  * and the count is the number of SEP chars left. */
object Bpe {

  /** Default pinned merges fixture (format: GPT-2 merges.txt — one
    * "left right" pair per line, rank = order, `#` comments). */
  def defaultMergesPath: String =
    sys.env.getOrElse("GRAFT_REPO", "/root/repo") + "/fixtures/bpe/merges.txt"

  /** Load + validate a merges file. Well-formedness (every non-single-
    * code-point symbol produced by an EARLIER rule) is what licenses the
    * sequential rank-order encoder — see [[graft.plans.BpeTokenCount]] —
    * so it is enforced here, not assumed. */
  def loadMerges(path: String = defaultMergesPath): Seq[(String, String)] = {
    import scala.jdk.CollectionConverters._
    val merges = java.nio.file.Files.readAllLines(java.nio.file.Paths.get(path))
      .asScala.map(_.trim)
      .filter(l => l.nonEmpty && !l.startsWith("#"))
      .map { l =>
        val parts = l.split(" ")
        require(parts.length == 2, s"malformed merges line: '$l'")
        (parts(0), parts(1))
      }.toSeq
    validate(merges)
    merges
  }

  /** Require every composite symbol to be introduced before use. */
  def validate(merges: Seq[(String, String)]): Unit = {
    val known = scala.collection.mutable.Set.empty[String]
    merges.zipWithIndex.foreach { case ((x, y), i) =>
      def ok(s: String) = s.codePointCount(0, s.length) == 1 || known(s)
      require(ok(x) && ok(y),
        s"merges rule $i ($x, $y) uses a composite symbol no earlier rule produced")
      known += x + y
    }
  }

  /** Real BPE token count over `text` with the given merges table. */
  def mergedTokenCount(text: Column, merges: Seq[(String, String)]): Column =
    graft.plans.BpeTokenCount.count(text, merges)

  // ---- DuckDB twin -----------------------------------------------------

  private def sqlStr(s: String) = "'" + s.replace("'", "''") + "'"
  private def sep(sym: String) = s"chr(1)||${sqlStr(sym)}"

  /** Generated oracle: chr(2)-marked pre-tokens, chr(1)-prefixed symbols,
    * one `replace` per merge rule in rank order, then count the SEPs. */
  def duckdbMergedCountSql(col: String, merges: Seq[(String, String)]): String = {
    val marked =
      s"array_to_string(list_transform(regexp_extract_all($col, ${sqlStr(Text.BpeTokenRe)}), " +
        "t -> chr(2) || array_to_string(list_transform(string_split(t, ''), " +
        "c -> chr(1) || c), '')), '')"
    val merged = merges.foldLeft(marked) { case (acc, (x, y)) =>
      s"replace($acc, ${sep(x)}||${sep(y)}, ${sep(x + y)})"
    }
    s"coalesce(length($merged) - length(replace($merged, chr(1), '')), 0)"
  }
}
