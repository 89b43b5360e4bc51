package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis primitives for the training-data pipeline surface:
  * tokenization, quality scoring, language ID, document fingerprinting.
  * All are pure `Column` expression chains (whole-stage-codegen'd, no UDFs),
  * with DuckDB-SQL twins built from the same constants so the oracle can
  * recompute them exactly.
  */
object Text {
  val TokenSplitRe = "\\s+"
  val PunctRe = "[.,;:!?]"

  /** BPE-ish pre-tokenization (the GPT-2-style split shape: letter runs,
    * digit runs, single punctuation marks) — portable between Java regex
    * and RE2. */
  val BpeTokenRe = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"

  /** Tiny per-language stopword lexicons for the language-ID heuristic.
    * Deliberately small and fixed: the heuristic scores a document by which
    * lexicon its tokens hit most. */
  val Lexicons: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of", "to", "a", "in", "is", "that"),
    "de" -> Seq("der", "die", "und", "das", "ist", "nicht", "ein", "zu"),
    "es" -> Seq("el", "la", "de", "que", "los", "una", "por", "con"),
    "fr" -> Seq("le", "la", "les", "des", "est", "une", "dans", "pour"))

  val EnStopwords: Seq[String] = Lexicons.head._2

  def tokens(text: Column): Column = split(trim(text), TokenSplitRe)

  /** Whitespace token count, as BIGINT for oracle schema parity. */
  def tokenCount(text: Column): Column = size(tokens(text)).cast("long")

  /** Single-char class ⇒ match count = chars removed; the length
    * difference avoids materializing a per-match array (one string element
    * per punctuation mark — measured ~2× on the quality-gate pass). */
  def punctCount(text: Column): Column =
    (length(text) - length(regexp_replace(text, PunctRe, ""))).cast("long")

  /** BPE-ish token count (sub-word pre-tokenization granularity). */
  def bpeTokenCount(text: Column): Column =
    size(regexp_extract_all(text, lit(BpeTokenRe), lit(0))).cast("long")

  /** Fraction of tokens that are English stopwords. */
  def stopwordRatio(text: Column): Column = {
    val toks = tokens(text)
    val hits = size(filter(toks, t => t.isInCollection(EnStopwords)))
    hits.cast("double") / size(toks).cast("double")
  }

  /** Composite quality score in [0,1]: rewards mid-length docs, moderate
    * punctuation, and a healthy stopword ratio — the shape of the
    * length/punct/stopword heuristics used by public web-scale corpus
    * filters (C4-style), expressed as a single arithmetic column. */
  def qualityScore(text: Column): Column = {
    val nTok = tokenCount(text).cast("double")
    val lenScore = least(nTok / lit(50.0), lit(1.0))
    val punctRatio = punctCount(text).cast("double") / greatest(length(text).cast("double"), lit(1.0))
    val punctScore = lit(1.0) - least(punctRatio * lit(10.0), lit(1.0))
    val stopScore = least(stopwordRatio(text) * lit(5.0), lit(1.0))
    lenScore * lit(0.4) + punctScore * lit(0.3) + stopScore * lit(0.3)
  }

  /** Per-lexicon hit count. */
  def lexiconHits(text: Column, words: Seq[String]): Column =
    size(filter(tokens(text), t => lower(t).isInCollection(words))).cast("long")

  /** Language-ID heuristic: argmax of lexicon hit counts, ties broken by
    * lexicon order, `und` (undetermined) when nothing hits. */
  def langId(text: Column): Column = {
    val hits = Lexicons.map { case (lang, words) => lang -> lexiconHits(text, words) }
    val best = hits.map(_._2).reduce((a, b) => greatest(a, b))
    val pick = hits.foldRight(lit("und")) { case ((lang, h), acc) =>
      when(h === best && h > 0, lit(lang)).otherwise(acc)
    }
    // foldRight keeps the FIRST matching lexicon (earlier entries overwrite
    // later ones' result), matching the documented tie-break.
    pick
  }

  /** Word n-gram shingles over an ALREADY-MATERIALIZED token array column.
    *
    * Callers must project the token array into its own column first
    * (`df.withColumn("toks", Text.tokens(lower($"text")))`): Catalyst does
    * not common-subexpression-eliminate across lambda boundaries, so
    * inlining `tokens(text)` here would re-run the regex split once PER
    * SHINGLE — O(tokens²) splits per document. A projection boundary makes
    * it a codegen local evaluated once per row. */
  def shinglesFromTokens(toks: Column, n: Int): Column = {
    val k = size(toks) - (n - 1)
    when(k <= 0, array(array_join(toks, " ")))
      .otherwise(transform(sequence(lit(0), k - 1),
        i => array_join(slice(toks, i + 1, lit(n)), " ")))
  }

  /** Convenience single-expression form — ONLY for tiny inputs/tests; hot
    * paths must use [[shinglesFromTokens]] (see its scaladoc). */
  def shingles(text: Column, n: Int): Column =
    shinglesFromTokens(tokens(lower(text)), n)

  /** Document fingerprint — DEFAULT form: the native O(n) rolling-hash
    * expression ([[graft.plans.RollingHashMin]], allocation-free codegen;
    * ~29× faster than the md5-shingle twin at sf0.1 in BENCH_r01).
    * Identical documents → identical fingerprint; near-identical documents
    * agree with probability ≈ window-level Jaccard. */
  def docFingerprint(text: Column, window: Int = 32): Column =
    graft.plans.RollingHashMin.rollingHashMin(text, window)

  /** Oracle twin of the fingerprint idea: min over md5 of word n-gram
    * shingles — same order-invariance, expressible in DuckDB SQL, so it
    * carries the hash-exact correctness check the native form can't.
    * Token-column form — see [[shinglesFromTokens]] for why. Hot paths
    * should ALSO materialize the shingle array at its own projection
    * boundary before the md5 transform (measured 5× at sf0.1; same
    * lambda-CSE trap one level up). */
  def docFingerprintMd5FromTokens(toks: Column, n: Int = 5): Column =
    array_min(transform(shinglesFromTokens(toks, n), s => md5(s)))

  def docFingerprintMd5(text: Column, n: Int = 5): Column =
    array_min(transform(shingles(text, n), s => md5(s)))

  // ---- DuckDB twins ----------------------------------------------------
  private def sqlStr(s: String) = "'" + s.replace("'", "''") + "'"
  private def sqlList(ws: Seq[String]) = ws.map(sqlStr).mkString("(", ",", ")")

  def duckdbTokensSql(col: String): String =
    s"string_split_regex(trim($col), ${sqlStr(TokenSplitRe)})"

  def duckdbTokenCountSql(col: String): String =
    s"len(${duckdbTokensSql(col)})"

  def duckdbPunctCountSql(col: String): String =
    s"(length($col) - length(regexp_replace($col, ${sqlStr(PunctRe)}, '', 'g')))"

  def duckdbBpeTokenCountSql(col: String): String =
    s"len(regexp_extract_all($col, ${sqlStr(BpeTokenRe)}))"

  def duckdbStopwordRatioSql(col: String): String =
    s"(len(list_filter(${duckdbTokensSql(col)}, t -> t IN ${sqlList(EnStopwords)}))::DOUBLE / len(${duckdbTokensSql(col)})::DOUBLE)"

  def duckdbQualityScoreSql(col: String): String = {
    val nTok = s"${duckdbTokenCountSql(col)}::DOUBLE"
    val lenScore = s"least($nTok / 50.0, 1.0)"
    val punctRatio = s"(${duckdbPunctCountSql(col)}::DOUBLE / greatest(length($col)::DOUBLE, 1.0))"
    val punctScore = s"(1.0 - least($punctRatio * 10.0, 1.0))"
    val stopScore = s"least(${duckdbStopwordRatioSql(col)} * 5.0, 1.0)"
    s"($lenScore * 0.4 + $punctScore * 0.3 + $stopScore * 0.3)"
  }

  def duckdbLexiconHitsSql(col: String, words: Seq[String]): String =
    s"len(list_filter(${duckdbTokensSql(col)}, t -> lower(t) IN ${sqlList(words)}))"

  def duckdbLangIdSql(col: String): String = {
    val hitExprs = Lexicons.map { case (lang, ws) => lang -> duckdbLexiconHitsSql(col, ws) }
    val best = hitExprs.map(_._2).reduce((a, b) => s"greatest($a, $b)")
    val cases = hitExprs.map { case (lang, h) =>
      s"WHEN $h = $best AND $h > 0 THEN ${sqlStr(lang)}"
    }.mkString(" ")
    s"(CASE $cases ELSE 'und' END)"
  }
}
