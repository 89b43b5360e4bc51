package graft.functions

import org.apache.spark.unsafe.types.UTF8String

/** One-pass implementation of the query-normalization spec — EXACTLY
  * equivalent to the pinned regex chain
  * (`lower → '[^']*'→? → \b[0-9]+\b→n → \s+→' ' → trim`, see
  * [[Normalize]]), but in a single scan instead of three regex passes
  * per row. Equivalence is property-tested against the regex chain in
  * `NormalizeNativeSpec`; the DuckDB oracle keeps using the regex form.
  *
  * Semantics pinned by the chain:
  *  - string literals: each `'...'` span between consecutive quotes
  *    collapses to `?`; a trailing unmatched quote stays;
  *  - digit runs collapse to `n` only when NOT adjacent to a word char
  *    (`[a-zA-Z0-9_]`) — Java regex ASCII `\b` semantics — evaluated on
  *    the text AFTER literal replacement;
  *  - ASCII whitespace runs (`[ \t\n\u000B\f\r]`) collapse to one space;
  *    leading/trailing runs are dropped (trim).
  */
object NormalizeImpl {

  private def isWord(c: Char): Boolean =
    (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z') ||
      (c >= '0' && c <= '9') || c == '_'

  private def isDigit(c: Char): Boolean = c >= '0' && c <= '9'

  private def isSpace(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == '\u000B' || c == '\f' || c == '\r'

  def normalize(s: String): String = {
    if (s == null) return null
    val lower = s.toLowerCase(java.util.Locale.ROOT)
    val n = lower.length
    val out = new java.lang.StringBuilder(n)
    var i = 0
    var pendingSpace = false      // a collapsed whitespace run awaiting output
    var lastWasWord = false       // last EMITTED char is a word char (for \b)
    var wroteAny = false          // suppresses the leading space (trim)

    def emit(c: Char): Unit = {
      if (pendingSpace) {
        if (wroteAny) out.append(' ') // leading run is trimmed
        pendingSpace = false
      }
      out.append(c)
      wroteAny = true
      lastWasWord = isWord(c)
    }

    while (i < n) {
      val c = lower.charAt(i)
      if (c == '\'') {
        val close = lower.indexOf('\'', i + 1)
        if (close >= 0) { emit('?'); i = close + 1 }
        else { emit('\''); i += 1 }
      } else if (isSpace(c)) {
        pendingSpace = true
        i += 1
      } else if (isDigit(c)) {
        var j = i
        while (j < n && isDigit(lower.charAt(j))) j += 1
        // boundary after the run: next char in the REMAINING input. A
        // following quote starts a literal → becomes '?', non-word; a
        // following space is non-word; so only a raw word char blocks.
        val nextBlocksRun = j < n && isWord(lower.charAt(j)) && !isDigit(lower.charAt(j))
        // NOTE: digits can't follow the maximal run by construction.
        val prevBlocks = lastWasWord && !pendingSpace
        if (prevBlocks || nextBlocksRun) {
          var k = i
          while (k < j) { emit(lower.charAt(k)); k += 1 }
        } else emit('n')
        i = j
      } else {
        emit(c)
        i += 1
      }
    }
    out.toString
  }

  /** UTF8String entry point for generated code. */
  def normalizeUTF8(u: UTF8String): UTF8String =
    if (u == null) null else UTF8String.fromString(normalize(u.toString))
}
