package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.types._

/** Pluggable recommendation backend — the seam the reference exposes as
  * `AISuggester` (`/root/reference/utils/ai_suggester.py:208-381`: one
  * LLM completion per pattern, response parsed into typed
  * recommendations). Both implementations produce the SAME output schema
  * as [[Recommend.recommend]] — `(pattern_id, rec_type, description,
  * impact_level, pattern_types)` — so Display/export/oracle consumers are
  * backend-agnostic.
  *
  * [[RuleRecommender]] is the OFFLINE DEFAULT everywhere (no egress in
  * this environment, and the deterministic subset of the reference's
  * prompt signals is exactly what the rule engine computes — under the
  * oracle via `q_analyze_pipeline`). [[LlmRecommender]] is the level-4
  * implementation point: prompt construction and response parsing are
  * real and spec-tested against a fake transport; wiring an actual HTTP
  * client in is a deployment concern (pass a transport closure that POSTs
  * to your completion endpoint).
  */
trait Recommender {
  def recommend(enriched: DataFrame, schemas: Option[DataFrame] = None): DataFrame
}

/** Deterministic rule engine (default): a single distributed projection,
  * no driver loop — see [[Recommend]]. */
object RuleRecommender extends Recommender {
  override def recommend(enriched: DataFrame,
                         schemas: Option[DataFrame] = None): DataFrame =
    Recommend.recommend(enriched, schemas)
}

/** LLM-backed recommender: builds one prompt per pattern (the reference's
  * per-pattern loop, `ai_suggester.py:214-216` — pattern cardinality is
  * small post-aggregation, so a driver loop is the right shape even at
  * 100 TB of logs), sends it through `transport`, and parses the
  * `Type:/Description:/Impact:` sections the reference's RESPONSE FORMAT
  * contract specifies (`ai_suggester.py:199-204`, parser at 290-345,
  * including the `**Type:**` markdown variant and the fenced ```sql
  * block).
  *
  * `transport` is prompt → completion text. Tests inject a canned
  * function; production injects an HTTP POST to a completion API. A
  * transport failure for one pattern skips that pattern (reference
  * behavior: log and continue), it does not fail the run.
  */
final class LlmRecommender(transport: String => String) extends Recommender {

  private val outSchema = StructType(Seq(
    StructField("pattern_id", StringType),
    StructField("rec_type", StringType),
    StructField("description", StringType),
    StructField("impact_level", StringType),
    StructField("pattern_types", StringType)))

  /** Compact metrics prompt carrying the same deterministic signals the
    * reference serializes (`ai_suggester.py:100-205`): usage metrics,
    * pattern-type keywords, user/system table split, dbt mapping state,
    * and the strict RESPONSE FORMAT footer the parser relies on. */
  private[operators] def buildPrompt(p: PatternFacts): String = {
    val mapped = if (p.models.isEmpty) "none" else p.models.mkString(", ")
    val unmapped = if (p.unmapped.isEmpty) "none" else p.unmapped.mkString(", ")
    s"""## QUERY PATTERN ANALYSIS REQUEST
       |
       |Pattern: ${p.sqlPattern}
       |Pattern types: ${p.patternTypes.mkString(", ")}
       |Frequency: ${p.frequency}  Avg duration ms: ${p.avgDurationMs}
       |High frequency: ${p.frequency > Recommend.HighFrequencyThreshold}  Long running: ${p.avgDurationMs > Recommend.LongRunningMsThreshold}
       |User tables: ${p.userTables.mkString(", ")}
       |Mapped dbt models: $mapped
       |Unmapped user tables: $unmapped
       |
       |System tables are excluded from optimization. Provide ONE specific,
       |high-impact recommendation for user tables only.
       |
       |## RESPONSE FORMAT
       |Type: [INDEX|REWRITE_QUERY|NEW_DBT_MODEL|NEW_DBT_MACRO]
       |Description: [Clear, specific implementation steps]
       |Impact: [HIGH|MEDIUM|LOW]
       |SQL: [Improved query or model definition if applicable]
       |""".stripMargin
  }

  /** Section extractor mirroring the reference's contract: a section
    * starts at `Marker:` or `**Marker:**` and runs until the next known
    * marker or a code fence; missing markers yield UNKNOWN
    * (`ai_suggester.py:290-331`). */
  private[operators] def extractSection(response: String, marker: String): String = {
    val markers = Seq("Type", "Description", "Impact", "SQL")
    val lines = response.split('\n').map(_.trim)
    def hasMarker(l: String, m: String) =
      l.contains(s"**$m:**") || l.matches(s"(?i)^$m:.*")
    val start = lines.indexWhere(l => hasMarker(l, marker))
    if (start < 0) return "UNKNOWN"
    val first = lines(start)
    val head =
      if (first.contains(s"**$marker:**")) first.split(s"\\*\\*$marker:\\*\\*", 2)(1).trim
      else first.split(":", 2)(1).trim
    val tail = lines.drop(start + 1)
      .takeWhile(l => !markers.exists(m => hasMarker(l, m)) && !l.startsWith("```"))
      .filter(_.nonEmpty)
    (head +: tail).mkString(" ").trim
  }

  /** The ```sql fenced block, if any (`ai_suggester.py:333-343`). */
  private[operators] def extractSql(response: String): Option[String] = {
    val lines = response.split('\n')
    val open = lines.indexWhere(_.contains("```sql"))
    if (open < 0) None
    else {
      val body = lines.drop(open + 1).takeWhile(!_.contains("```"))
      if (body.isEmpty) None else Some(body.mkString("\n"))
    }
  }

  /** Facts handed to the prompt builder, extracted once per pattern. */
  private[operators] case class PatternFacts(
      patternId: String, sqlPattern: String, frequency: Long,
      avgDurationMs: Double, tables: Seq[String], models: Seq[String],
      unmapped: Seq[String]) {
    def userTables: Seq[String] = tables.filterNot(t =>
      Filters.SystemPrefixes.exists(t.toLowerCase.startsWith))
    def patternTypes: Seq[String] = {
      val lc = sqlPattern.toLowerCase
      val hits = Seq(
        "group by" -> "Aggregation", "join" -> "Join", "where" -> "Filter",
        "with" -> "CTE", "union" -> "SetOperation", "window" -> "Window",
        "having" -> "ComplexFilter", "order by" -> "Sorting")
        .collect { case (kw, label) if lc.contains(kw) => label }
      if (hits.isEmpty && lc.contains("select")) Seq("Simple Select") else hits
    }
  }

  private def seq(r: Row, field: String): Seq[String] =
    if (r.schema.fieldNames.contains(field) && !r.isNullAt(r.fieldIndex(field)))
      r.getSeq[String](r.fieldIndex(field))
    else Seq.empty

  override def recommend(enriched: DataFrame,
                         schemas: Option[DataFrame] = None): DataFrame = {
    val spark = enriched.sparkSession
    // pattern cardinality: post-agg, tiny by construction (SURVEY §2.9)
    val rows = enriched.select("pattern_id", "sql_pattern", "frequency",
      "avg_duration_ms", "tables_accessed", "dbt_models_used", "unmapped_tables")
      .collect()
    val out = rows.toSeq.flatMap { r =>
      val f = PatternFacts(
        r.getAs[String]("pattern_id"), r.getAs[String]("sql_pattern"),
        r.getAs[Long]("frequency"), r.getAs[Double]("avg_duration_ms"),
        seq(r, "tables_accessed"), seq(r, "dbt_models_used"),
        seq(r, "unmapped_tables"))
      // system-table-only patterns get no prompt (ai_suggester.py:219-221)
      if (f.userTables.isEmpty) None
      else
        try {
          val resp = transport(buildPrompt(f))
          val impact = extractSection(resp, "Impact").toUpperCase match {
            case i @ ("HIGH" | "MEDIUM" | "LOW") => i
            case _ => "UNKNOWN"
          }
          Some(Row(f.patternId, extractSection(resp, "Type"),
            extractSection(resp, "Description"), impact,
            f.patternTypes.mkString(",")))
        } catch {
          case e: Throwable => // reference: log and continue (py:335-337)
            System.err.println(
              s"[recommender] ${f.patternId} failed: ${e.getMessage}")
            None
        }
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(out, math.max(1, out.size min 8)), outSchema)
  }
}
