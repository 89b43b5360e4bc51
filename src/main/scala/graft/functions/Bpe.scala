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

  /** Marker path meaning "read the fixture bundled on the classpath". */
  val ClasspathMerges = "classpath:bpe/merges.txt"

  /** Default pinned merges fixture (format: GPT-2 merges.txt — one
    * "left right" pair per line, rank = order, `#` comments). Resolved in
    * order: `GRAFT_BPE_MERGES` env override, `$GRAFT_REPO/fixtures/bpe/
    * merges.txt`, `fixtures/bpe/merges.txt` relative to the working
    * directory, then the identical copy bundled as a classpath resource —
    * so any checkout (or the packaged jar alone) resolves without
    * container-specific absolute paths.
    *
    * An EXPLICIT `GRAFT_BPE_MERGES` that points at a missing file FAILS
    * instead of falling back: a typo'd override silently tokenizing with
    * the bundled fixture would mis-count every document while looking
    * configured. */
  def defaultMergesPath: String = resolveMergesPath(sys.env)

  private[graft] def resolveMergesPath(env: Map[String, String]): String =
    env.get("GRAFT_BPE_MERGES") match {
      case Some(p) =>
        require(java.nio.file.Files.exists(java.nio.file.Paths.get(p)),
          s"GRAFT_BPE_MERGES is set to '$p' but no such file exists " +
            "(refusing to fall back to the bundled fixture)")
        p
      case None =>
        (env.get("GRAFT_REPO").map(_ + "/fixtures/bpe/merges.txt") ++
          Seq("fixtures/bpe/merges.txt"))
          .find(p => java.nio.file.Files.exists(java.nio.file.Paths.get(p)))
          .getOrElse(ClasspathMerges)
    }

  /** Load + validate a merges file (filesystem path or the
    * `classpath:` marker). Well-formedness (every non-single-code-point
    * symbol produced by an EARLIER rule, and each composite introduced at
    * most ONCE) is what licenses the sequential rank-order encoder — see
    * [[graft.plans.BpeTokenCount]] — so it is enforced here, not assumed. */
  def loadMerges(path: String = defaultMergesPath): Seq[(String, String)] = {
    val lines: Seq[String] =
      if (path == ClasspathMerges) {
        val in = getClass.getClassLoader.getResourceAsStream("bpe/merges.txt")
        require(in != null, "bundled bpe/merges.txt resource missing")
        try scala.io.Source.fromInputStream(in, "UTF-8").getLines().toSeq
        finally in.close()
      } else {
        import scala.jdk.CollectionConverters._
        java.nio.file.Files.readAllLines(java.nio.file.Paths.get(path)).asScala.toSeq
      }
    val merges = lines.map(_.trim)
      .filter(l => l.nonEmpty && !l.startsWith("#"))
      .map { l =>
        val parts = l.split(" ")
        require(parts.length == 2, s"malformed merges line: '$l'")
        (parts(0), parts(1))
      }
    validate(merges)
    merges
  }

  /** Require every composite symbol to be introduced before use, and
    * introduced exactly once: a symbol re-introduced by a later rule
    * (e.g. 'abc' via (ab,c) and again via (a,bc)) could create
    * adjacencies after a consuming rule's pass that the sequential
    * rank-order encoder never revisits — breaking its equivalence with
    * the priority-queue encoder. */
  def validate(merges: Seq[(String, String)]): Unit = {
    val known = scala.collection.mutable.Set.empty[String]
    merges.zipWithIndex.foreach { case ((x, y), i) =>
      def ok(s: String) = s.codePointCount(0, s.length) == 1 || known(s)
      require(ok(x) && ok(y),
        s"merges rule $i ($x, $y) uses a composite symbol no earlier rule produced")
      require(!known(x + y),
        s"merges rule $i ($x, $y) re-introduces symbol '${x + y}'")
      known += x + y
    }
  }

  /** Real BPE token count over `text` with the given merges table. */
  def mergedTokenCount(text: Column, merges: Seq[(String, String)]): Column =
    graft.plans.BpeTokenCount.count(text, merges)

  /** The encoded symbol sequence itself — the tokenizer surface. */
  def tokens(text: Column, merges: Seq[(String, String)]): Column =
    graft.plans.BpeTokenCount.tokens(text, merges)

  /** Deterministic id scheme shared with the oracle: single-code-point
    * symbols map to their code point; composite symbols map to
    * 256 + first-introducing-rule rank. */
  def vocabIds(merges: Seq[(String, String)]): Map[String, Int] = {
    val b = scala.collection.mutable.LinkedHashMap.empty[String, Int]
    merges.zipWithIndex.foreach { case ((x, y), i) =>
      if (!b.contains(x + y)) b(x + y) = 256 + i // first introduction wins
    }
    b.toMap
  }

  /** Token string → id (see [[vocabIds]]). */
  def tokenId(tok: Column, merges: Seq[(String, String)]): Column = {
    import org.apache.spark.sql.functions.{ascii, element_at, length, typedLit, when}
    when(length(tok) === 1, ascii(tok))
      .otherwise(element_at(typedLit(vocabIds(merges)), tok))
  }

  // ---- DuckDB twin -----------------------------------------------------

  private def sqlStr(s: String) = "'" + s.replace("'", "''") + "'"

  /** Length-prefixed symbol encoding (r14): `chr(1) || chr(32+len) ||
    * sym`. The length byte is load-bearing — with the bare `chr(1)||sym`
    * form a merge pattern `SEP||x||SEP||y` also matches when the symbol
    * after x merely STARTS with y (symbols [t, he] under rule (t, h)),
    * silently over-merging; the pinned fixture never exercised that
    * configuration, but the r14 LEARNED-merges oracles hit it at the
    * sf0.01 gate (BpeTrain.replaceStep — the same fix, same rationale).
    * A longer symbol now fails the pattern at its length byte, while the
    * left-to-right non-overlapping run-chaining ("aaa" → aa, a) that
    * trailing-delimiter encodings break is preserved.
    *
    * GUARDED (r15, ADVICE): the encoding's two blind spots now fail by
    * name at SQL-generation time instead of as a cryptic DuckDB `chr()`
    * error or a silent mismatch — a symbol long enough to push `32+len`
    * into the UTF surrogate range chr() rejects (55296–57343), and a
    * symbol carrying the chr(1)/chr(2) framing bytes themselves (which
    * the corpus-side guard in [[mergedExprSql]] mirrors for text). */
  private def sep(sym: String) = {
    val n = sym.codePointCount(0, sym.length)
    require(32 + n < 0xD800, s"bpe oracle: symbol of $n code points needs " +
      s"a chr(${32 + n}) length byte - inside the UTF surrogate range " +
      "DuckDB chr() rejects; the length-prefix encoding cannot frame it")
    require(!sym.exists(c => c == '\u0001' || c == '\u0002'),
      "bpe oracle: symbol contains the chr(1)/chr(2) framing control " +
        "characters - the length-prefix encoding cannot frame it")
    s"chr(1)||chr(${32 + n})||${sqlStr(sym)}"
  }

  /** Corpus-side oracle guard (r15, ADVICE): text containing literal
    * chr(1)/chr(2) control characters (which `Text.BpeTokenRe`'s
    * `[^A-Za-z0-9\s]` branch happily tokenizes) would corrupt the framed
    * encoding silently — error BY NAME instead. Shared with
    * [[graft.operators.BpeTrain]]'s training/apply replays. */
  private[graft] def guardedText(col: String): String =
    s"(CASE WHEN regexp_matches($col, '[\\x01\\x02]') THEN " +
      s"error('graft bpe oracle: text contains chr(1)/chr(2) framing bytes') " +
      s"ELSE $col END)"

  private def mergedExprSql(col: String, merges: Seq[(String, String)]): String = {
    val marked =
      s"array_to_string(list_transform(regexp_extract_all(${guardedText(col)}, ${sqlStr(Text.BpeTokenRe)}), " +
        "t -> chr(2) || array_to_string(list_transform(string_split(t, ''), " +
        "c -> chr(1) || chr(33) || c), '')), '')"
    merges.foldLeft(marked) { case (acc, (x, y)) =>
      s"replace($acc, ${sep(x)}||${sep(y)}, ${sep(x + y)})"
    }
  }

  /** Generated oracle: chr(2)-marked pre-tokens, length-prefixed
    * chr(1)-joined symbols (see [[sep]]), one `replace` per merge rule
    * in rank order, then count the SEPs. */
  def duckdbMergedCountSql(col: String, merges: Seq[(String, String)]): String = {
    val merged = mergedExprSql(col, merges)
    s"coalesce(length($merged) - length(replace($merged, chr(1), '')), 0)"
  }

  /** Oracle twin of [[tokens]]: split the merged string on chr(1) —
    * fragment 1 is the leading chr(2), later pre-token markers stick to
    * the preceding symbol and are stripped, and each fragment drops its
    * length byte — yielding the symbol sequence in order. */
  def duckdbTokensSql(col: String, merges: Seq[(String, String)]): String =
    s"list_transform(string_split(${mergedExprSql(col, merges)}, chr(1))[2:], " +
      "f -> replace(f, chr(2), '')[2:])"

  /** Oracle twin of [[tokenId]]'s id scheme, as a CASE over the vocab. */
  def duckdbTokenIdSql(tok: String, merges: Seq[(String, String)]): String = {
    val arms = vocabIds(merges).map { case (s, id) =>
      s"WHEN $tok = ${sqlStr(s)} THEN $id"
    }.mkString(" ")
    s"(CASE $arms ELSE ascii($tok) END)"
  }
}
