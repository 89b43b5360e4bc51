package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.udf
import scala.util.control.NonFatal
import scala.util.matching.Regex

/** U2: SQL table-reference extraction (the reference's riskiest
  * compatibility surface — `utils/sql_parser.py:11-192`).
  *
  * Semantics mirrored from the reference:
  *  - only FROM / JOIN targets count (`sql_parser.py:118-134`);
  *  - CTE names are excluded (`sql_parser.py:91-110`);
  *  - dbt `ref('m')` → `m`, `source('a','b')` → `a.b`
  *    (`sql_parser.py:71-89`);
  *  - multi-part identifiers keep only the last two parts as
  *    `schema.table`; single-part names stay bare; everything
  *    lowercased, quotes/backticks stripped (`sql_parser.py:26-45`);
  *  - only SELECT/INSERT/UPDATE/DELETE statements are scanned
  *    (`sql_parser.py:176-178`);
  *  - any parse trouble → empty set (`sql_parser.py:184-187`).
  *
  * Implementation is a deliberate small tokenizer over regexes rather than
  * a full SQL grammar: ClickHouse SQL is not fully Spark-parsable, and the
  * reference's own sqlparse pass has exactly this fidelity. Pure Scala so
  * it is usable driver-side (dbt files) and as a UDF over log tables.
  */
object SqlTables {

  private val CteRe: Regex =
    """(?is)(?:\bwith\s+|,\s*)([a-zA-Z_][\w]*)\s+as\s*\(""".r
  private val RefRe: Regex =
    """(?is)\bref\s*\(\s*['"]([^'"]+)['"]\s*\)""".r
  private val SourceRe: Regex =
    """(?is)\bsource\s*\(\s*['"]([^'"]+)['"]\s*,\s*['"]([^'"]+)['"]\s*\)""".r
  /** FROM/JOIN followed by a table identifier (not a subquery, not a dbt
    * macro — those are handled separately). */
  private val FromJoinRe: Regex =
    """(?is)\b(?:from|join)\s+((?!\()[`"'\w.]+)""".r
  private val DmlRe: Regex = """(?is)\b(select|insert|update|delete)\b""".r

  /** Last-two-parts canonicalization (`sql_parser.py:26-45`). */
  private[graft] def canonical(raw: String): Option[String] = {
    val clean = raw.replaceAll("""[`"']""", "").trim
    if (clean.isEmpty) None
    else {
      val parts = clean.split('.').filter(_.nonEmpty)
      parts.length match {
        case 0 => None
        case 1 => Some(parts(0).toLowerCase)
        case _ => Some(s"${parts(parts.length - 2)}.${parts.last}".toLowerCase)
      }
    }
  }

  def extractTables(sql: String): Set[String] = try {
    if (sql == null || DmlRe.findFirstIn(sql).isEmpty) Set.empty
    else {
      val cteNames = CteRe.findAllMatchIn(sql).map(_.group(1).toLowerCase).toSet
      val plain = FromJoinRe.findAllMatchIn(sql).flatMap { m =>
        val tok = m.group(1)
        // `FROM ref(...)` / `FROM {{ ref(...) }}`: the macro regexes own it.
        if (tok.equalsIgnoreCase("ref") || tok.equalsIgnoreCase("source")) None
        else canonical(tok)
      }.toSet
      val refs = RefRe.findAllMatchIn(sql).map(_.group(1).toLowerCase).toSet
      val sources = SourceRe.findAllMatchIn(sql)
        .map(m => s"${m.group(1)}.${m.group(2)}".toLowerCase).toSet
      (plain -- cteNames -- cteNames.map(c => s"$c.$c")) ++ refs ++ sources
    }
  } catch { case NonFatal(_) => Set.empty }

  /** Sorted for deterministic array comparisons downstream. */
  def extractTablesSorted(sql: String): Seq[String] =
    extractTables(sql).toSeq.sorted

  /** Column form for log enrichment. A Scala UDF is acceptable here: the
    * tokenizer is genuinely imperative (U2), runs once per raw log row
    * before the pattern aggregation collapses cardinality, and has no
    * builtin equivalent. */
  val extractTablesUdf =
    udf((sql: String) => extractTablesSorted(sql))

  def extracted(queryCol: Column): Column = extractTablesUdf(queryCol)

  /** Per-JVM memo for the tokenizer: each executor parses a distinct text
    * at most once, then serves repeats from memory. Query logs repeat
    * heavily (the premise of the tool), so this gets the once-per-distinct
    * economics of dictionary encoding WITHOUT its two shuffles (distinct +
    * join-back) — and when texts happen to be all-distinct it degrades to
    * plain per-row parsing instead of paying those shuffles for nothing.
    * The map is insert-capped: past [[MemoMax]] entries it stops caching
    * (results stay correct, the cache just stops growing). */
  private val memo =
    new java.util.concurrent.ConcurrentHashMap[String, Seq[String]]()
  private val MemoMax = 100000

  val extractTablesMemoUdf = udf { (sql: String) =>
    val hit = memo.get(sql)
    if (hit != null) hit
    else {
      val r = extractTablesSorted(sql)
      if (memo.size < MemoMax) memo.put(sql, r)
      r
    }
  }

  def extractedMemo(queryCol: Column): Column = extractTablesMemoUdf(queryCol)
}
