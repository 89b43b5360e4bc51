package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Query normalization + fingerprinting (SURVEY.md P2/U1).
  *
  * The reference delegates to ClickHouse's `normalizeQuery` +
  * `cityHash64` (`utils/data_acquisition.py:133`) to assign every raw SQL
  * text a stable pattern identity. Spark has no such builtin, so we pin our
  * own spec: lowercase, collapse quoted string literals to `?`, collapse
  * integer literals to `n`, collapse runs of whitespace — then hash.
  *
  * The regexes are deliberately portable across Java regex (Spark) and RE2
  * (DuckDB oracle) so the DuckDB side can replicate the chain verbatim;
  * the shared constants below are the single source of truth for both.
  *
  * Two hash forms:
  *  - [[patternHash]]: `xxhash64` — 64-bit, codegen'd, the engine's internal
  *    pattern identity (stability across runs is what matters, not equality
  *    with ClickHouse's cityHash64).
  *  - [[fingerprint]]: `md5` — portable to the DuckDB oracle, used wherever a
  *    correctness check needs to recompute the identity outside Spark.
  */
object Normalize {
  /** Single-quoted string literals (no escape handling — matches the
    * reference's normalization granularity, which is ClickHouse-side). */
  val LiteralRe = "'[^']*'"
  /** Integer literals as standalone words. */
  val NumberRe = "\\b[0-9]+\\b"
  /** Whitespace runs. */
  val SpaceRe = "\\s+"

  /** Canonical normalized text. The regex chain below IS the spec (and the
    * DuckDB-oracle form); the default execution path is the native
    * one-pass scanner [[graft.plans.NormalizeQueryExpr]], property-tested
    * exactly equivalent in `NormalizeNativeSpec`. The chain is
    * order-sensitive (strings first, so digits inside string literals
    * don't survive as `n`). */
  def normalizeQuery(c: Column): Column =
    graft.plans.NormalizeQueryExpr.normalizeQueryNative(c)

  /** The composable regex-chain form — the executable spec. */
  def normalizeQueryComposed(c: Column): Column =
    trim(regexp_replace(
      regexp_replace(
        regexp_replace(lower(c), LiteralRe, "?"),
        NumberRe, "n"),
      SpaceRe, " "))

  /** Portable 128-bit fingerprint of the normalized text (oracle-checkable). */
  def fingerprint(c: Column): Column = md5(normalizeQuery(c))

  /** Engine-internal 64-bit pattern identity (faster; not oracle-portable). */
  def patternHash(c: Column): Column = xxhash64(normalizeQuery(c))

  /** The same normalization chain as a DuckDB SQL expression over `colSql`,
    * built from the same regex constants (guaranteed parity with
    * [[normalizeQuery]]). DuckDB regexp_replace needs the 'g' flag to match
    * Spark's replace-all semantics.
    */
  def duckdbNormalizeSql(colSql: String): String = {
    def q(s: String) = "'" + s.replace("'", "''") + "'"
    s"trim(regexp_replace(regexp_replace(regexp_replace(lower($colSql), ${q(LiteralRe)}, '?', 'g'), ${q(NumberRe)}, 'n', 'g'), ${q(SpaceRe)}, ' ', 'g'))"
  }

  def duckdbFingerprintSql(colSql: String): String =
    s"md5(${duckdbNormalizeSql(colSql)})"
}
