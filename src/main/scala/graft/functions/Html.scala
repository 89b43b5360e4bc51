package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** HTML → text extraction for web-corpus ingestion — the WET-style
  * "strip the markup, keep the prose" step that precedes every quality
  * gate in a crawl pipeline (reference scope: querysight ingests logs,
  * not crawl — this extends the corpus-hygiene surface the way
  * [[Urls]] and Dedup.removeBoilerplateLines do). All codegen'd builtin
  * columns — regexp/literal replacement chains, no UDFs; map-only.
  *
  * Extraction contract (deliberately small and deterministic — a
  * readability-grade extractor is a model, not a string transform):
  *   1. `<script>…</script>` and `<style>…</style>` PAIRED blocks are
  *      removed with their content (non-greedy, case-insensitive,
  *      dot-matches-newline). An UNCLOSED script/style tag is not a
  *      block — its tag is stripped in step 3 and its content survives
  *      as text (documented limit: malformed HTML degrades to noisy
  *      text, never to dropped prose).
  *   2. `<!-- comments -->` removed with content.
  *   3. Every remaining `<…>` tag replaced by a space (block/inline
  *      distinction is irrelevant once whitespace collapses).
  *   4. The five ubiquitous named/numeric entities decoded — `&lt;`
  *      `&gt;` `&quot;` `&#39;` `&nbsp;` — then `&amp;` LAST, so
  *      double-encoded text (`&amp;lt;`) decodes one level to the
  *      literal `&lt;` exactly as a browser would. Entities outside
  *      this set pass through verbatim.
  *   5. Whitespace runs collapse to one space; result trimmed.
  *
  * Extraction is a FIXED POINT only for output containing no tag-shaped
  * content and no decodable entities. It is NOT idempotent in general:
  * decoding can CREATE tag-shaped text — `1 &lt; 2 &gt; 0` extracts to
  * `1 < 2 > 0`, and a second application strips `< 2 >` as a tag,
  * dropping prose to `1 0`. Pipelines must apply extraction exactly ONCE
  * per document (the property test pins both the fixed-point class and
  * this counterexample class); the never-dropped-prose guarantee in step
  * 1 holds for that single application.
  *
  * Like [[Scrub]] and [[Urls]], every pattern uses only syntax with
  * identical semantics in Java regex (Spark) and RE2 (DuckDB oracle):
  * inline `(?is)` flags, character classes, non-greedy repetition — no
  * lookaround, no backreferences. */
object Html {

  /** (pattern, replacement) regex passes, in order. */
  private val RegexPasses: Seq[(String, String)] = Seq(
    "(?is)<script\\b[^>]*>.*?</script>" -> " ",
    "(?is)<style\\b[^>]*>.*?</style>" -> " ",
    "(?s)<!--.*?-->" -> " ",
    "<[^>]*>" -> " ")

  /** (literal, replacement) entity decodes, in order (`&amp;` LAST). */
  private val EntityPasses: Seq[(String, String)] = Seq(
    "&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"",
    "&#39;" -> "'", "&nbsp;" -> " ", "&amp;" -> "&")

  /** Extracted text of an HTML column per the object contract. */
  def extractText(html: Column): Column = {
    val stripped = RegexPasses.foldLeft(html) {
      case (c, (re, rep)) => regexp_replace(c, re, rep)
    }
    val decoded = EntityPasses.foldLeft(stripped) {
      case (c, (lit_, rep)) => replace(c, lit(lit_), lit(rep))
    }
    trim(regexp_replace(decoded, "\\s+", " "))
  }

  /** Text density — extracted chars over raw markup chars, the classic
    * boilerplate-page signal (nav/ad shells score low). Null on empty
    * markup (ANSI-safe). */
  def textDensity(textLen: Column, htmlLen: Column): Column =
    when(htmlLen === 0, lit(null).cast("double"))
      .otherwise(textLen.cast("double") / htmlLen.cast("double"))

  // ---------------------------------------------------------------- oracle

  private def sqlLit(s: String) = "'" + s.replace("'", "''") + "'"

  /** DuckDB expression computing [[extractText]] over `col` — the same
    * passes in the same order (RE2 accepts each pattern verbatim). */
  def duckdbExtractSql(col: String): String = {
    val stripped = RegexPasses.foldLeft(col) {
      case (e, (re, rep)) =>
        s"regexp_replace($e, ${sqlLit(re)}, ${sqlLit(rep)}, 'g')"
    }
    val decoded = EntityPasses.foldLeft(stripped) {
      case (e, (l, rep)) => s"replace($e, ${sqlLit(l)}, ${sqlLit(rep)})"
    }
    s"trim(regexp_replace($decoded, '\\s+', ' ', 'g'))"
  }
}
