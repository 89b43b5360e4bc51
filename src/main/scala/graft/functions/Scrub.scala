package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** PII / URL scrubbing for training-text hygiene: redact emails, URLs and
  * IPv4 addresses with typed placeholder tokens and count what was hit —
  * the standard pre-training redaction pass, expressed as a chain of
  * codegen'd `regexp_replace` columns (no UDFs).
  *
  * Patterns deliberately use only syntax with identical semantics in
  * Java's regex engine (Spark) and RE2 (DuckDB oracle): character
  * classes, bounded quantifiers, and `\b` word boundaries — no lookaround,
  * no backreferences. That keeps the scrubbed TEXT bit-comparable across
  * engines, which is the actual correctness risk of a regex pass.
  */
object Scrub {
  val UrlRe = "https?://[^\\s]+"
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val Ipv4Re = "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b"

  val UrlToken = "<URL>"
  val EmailToken = "<EMAIL>"
  val IpToken = "<IP>"

  /** Redaction order matters and is part of the contract: URLs first
    * (they may contain email- or IP-shaped substrings), then emails, then
    * bare IPs. */
  def scrub(c: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(c, UrlRe, UrlToken),
        EmailRe, EmailToken),
      Ipv4Re, IpToken)

  def countMatches(c: Column, re: String): Column =
    size(regexp_extract_all(c, lit(re), lit(0))).cast("long")

  // ---- DuckDB twins ------------------------------------------------------

  /** DuckDB regex literals: RE2 accepts the same pattern text, and DuckDB
    * single-quoted strings are raw (no backslash processing), so the
    * runtime pattern is embedded verbatim — single-quote escaping only. */
  private def reLit(re: String) = "'" + re.replace("'", "''") + "'"

  def duckdbScrubSql(col: String): String =
    s"regexp_replace(regexp_replace(regexp_replace($col, ${reLit(UrlRe)}, '$UrlToken', 'g'), ${reLit(EmailRe)}, '$EmailToken', 'g'), ${reLit(Ipv4Re)}, '$IpToken', 'g')"

  def duckdbCountSql(col: String, re: String): String =
    s"len(regexp_extract_all($col, ${reLit(re)}))::BIGINT"
}
