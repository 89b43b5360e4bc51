package graft

import graft.functions.Html
import org.apache.spark.sql.functions._

/** HTML → text extraction (Html scaladoc): block removal, entity
  * decoding order, malformed-markup degradation, idempotence, and the
  * map-only plan. */
class HtmlSpec extends SparkSpec {
  import spark.implicits._

  private def extract(htmls: String*): Seq[String] =
    htmls.toDF("h").select(Html.extractText(col("h")).as("t"))
      .collect().map(_.getString(0)).toSeq

  test("script/style/comment content vanishes, including script-body operators") {
    val Seq(got) = extract(
      "<html><head><style>p { color: red; }</style>" +
        "<script>if (a < b && b > 0) { alert(\"secret\"); }</script></head>" +
        "<body><!-- hidden note --><p>Hello <b>world</b></p></body></html>")
    assert(got == "Hello world", got)
    assert(!got.contains("secret") && !got.contains("color") &&
      !got.contains("hidden"))
  }

  test("entities decode in order: the five named ones, &amp; last, one level only") {
    val Seq(got) = extract(
      "a&nbsp;b &lt;tag&gt; &quot;q&quot; it&#39;s &amp; done &amp;lt;raw&amp;gt; &copy;")
    assert(got == "a b <tag> \"q\" it's & done &lt;raw&gt; &copy;", got)
  }

  test("an unclosed script degrades to stripped-tag text, never dropped prose") {
    // no closing </script>: the PAIRED pass cannot fire, the tag strip
    // removes only the tags, and the body text after it survives
    val Seq(got) = extract(
      "<p>before</p><script>var x = 1;</script ...truncated <p>after</p>")
    assert(got.contains("before"), got)
    // the malformed tail is noisy text, not silence — the contract is
    // "malformed HTML degrades to noise, never to dropped prose"
    assert(got.contains("var x = 1;"), got)
  }

  test("fixed point for tag-free, entity-free output; decodable angle entities break it") {
    // the fixed-point CLASS (Html scaladoc): output with no tag-shaped
    // content and no decodable entities re-extracts to itself
    val pages = Seq(
      "<html><body><h1>T</h1><p>one &amp; two&nbsp;three</p></body></html>",
      "plain text stays plain",
      "<div>spaced   <i>out</i>\n\nlines</div>")
    val once = pages.toDF("h").select(Html.extractText(col("h")).as("t"))
    val twice = once.select(col("t"), Html.extractText(col("t")).as("t2"))
      .collect()
    twice.foreach(r => assert(r.getString(0) == r.getString(1), r.toString))
    // the documented LIMIT: decoding &lt;/&gt; creates tag-shaped text,
    // and a second application strips it as a tag, dropping prose —
    // extraction is single-application-only on such pages
    val Seq(first) = extract("<p>1 &lt; 2 &gt; 0</p>")
    assert(first == "1 < 2 > 0", first)
    val Seq(second) = extract(first)
    assert(second == "1 0", second)
  }

  test("density guards empty markup and ranks a text page above a shell") {
    val rows = Seq(
      (1L, "<html><body><p>a long paragraph of genuine readable prose " +
        "that dominates its markup</p></body></html>"),
      (2L, "<html><head><script>var nav = { a: 1, b: 2, c: 3 };" +
        "</script></head><body><nav><a href=\"/x\">x</a></nav></body></html>"),
      (3L, ""))
      .toDF("id", "h")
      .select(col("id"), length(col("h")).as("nh"),
        length(Html.extractText(col("h"))).as("nt"))
      .select(col("id"), Html.textDensity(col("nt"), col("nh")).as("d"))
      .orderBy("id").collect()
    assert(rows(0).getDouble(1) > rows(1).getDouble(1))
    assert(rows(2).isNullAt(1), "empty markup must yield null density")
  }

  test("extraction is map-only: no exchange in the executed plan") {
    val df = Seq("<p>x</p>").toDF("h").select(Html.extractText(col("h")))
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
  }
}
