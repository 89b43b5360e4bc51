package graft

import java.sql.Timestamp

/** S10 ANSI layer: colored output must be byte-identical to plain output
  * after escape-stripping (styling is terminal paint, never layout), and
  * styles must match the reference's rich markup
  * (`querysight.py:91-116,750-813`). */
class DisplaySpec extends SparkSpec {
  import spark.implicits._

  private def patterns = Seq(
    ("p_slow", 10L, 2500.0, 2097152.0, Seq("alice"), Seq("orders"),
      Timestamp.valueOf("2024-01-01 00:00:00"), Timestamp.valueOf("2024-06-01 00:00:00")),
    ("p_med", 5L, 300.0, 1048576.0, Seq("bob"), Seq("lineitem"),
      Timestamp.valueOf("2024-02-01 00:00:00"), Timestamp.valueOf("2024-05-01 00:00:00")),
    ("p_fast", 50L, 20.0, 524288.0, Seq("carol"), Seq("nation"),
      Timestamp.valueOf("2024-03-01 00:00:00"), Timestamp.valueOf("2024-04-01 00:00:00")))
    .toDF("pattern_id", "frequency", "avg_duration_ms", "memory_usage",
      "users", "tables_accessed", "first_seen", "last_seen")

  test("plain output carries no escape bytes; colored output strips to it exactly") {
    val plain = Display.queryPatterns(patterns, color = false)
    val colored = Display.queryPatterns(patterns, color = true)
    assert(!plain.contains('\u001b'))
    assert(colored.contains('\u001b'))
    assert(Display.Ansi.strip(colored) == plain)
  }

  test("duration buckets color like the reference: red >1s, yellow >100ms, green otherwise") {
    val colored = Display.queryPatterns(patterns, color = true)
    assert(colored.contains("\u001b[31m2,500.00 ms"))  // slow → red
    assert(colored.contains("\u001b[33m300.00 ms"))    // medium → yellow
    assert(colored.contains("\u001b[32m20.00 ms"))     // fast → green
    assert(colored.contains("\u001b[36mp_slow"))       // pattern id → cyan
    assert(colored.contains("\u001b[34malice"))        // users → blue
    assert(colored.contains("\u001b[35morders"))       // tables → magenta
  }

  test("recommendation impact styling strips clean and colors by level") {
    val recs = Seq(
      ("p1", "index", "HIGH", "add an index"),
      ("p2", "rewrite", "LOW", "simplify the filter"))
      .toDF("pattern_id", "rec_type", "impact_level", "description")
    val plain = Display.recommendations(recs, color = false)
    val colored = Display.recommendations(recs, color = true)
    assert(Display.Ansi.strip(colored) == plain)
    assert(colored.contains("\u001b[31mHIGH"))
    assert(colored.contains("\u001b[32mLOW"))
  }

  test("empty frames keep their messages, colored or not") {
    val empty = patterns.limit(0)
    assert(Display.queryPatterns(empty, color = false) == "No query patterns found\n")
    assert(Display.Ansi.strip(Display.queryPatterns(empty, color = true))
      == "No query patterns found\n")
  }
}
