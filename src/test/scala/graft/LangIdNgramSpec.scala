package graft

import graft.functions.{LangIdNgram, Text}
import org.apache.spark.sql.functions._

/** The hashed char-trigram language ID (LangIdNgram scaladoc): it must
  * classify exactly the short / stopword-free / mixed-script documents
  * that defeat the word-lexicon argmax, stay bit-deterministic (pinned
  * fixture), and stay map-only. */
class LangIdNgramSpec extends SparkSpec {
  import spark.implicits._

  /** Short docs with NO lexicon stopwords — the word-lexicon heuristic
    * returns `und` on every one of them; the trigram scorer must get the
    * language right. (zh has no whitespace tokens at all, the exact
    * q_script_mix-detects-but-cannot-classify case the upgrade is for.) */
  private val planted = Seq(
    (1L, "bitte schön danke sehr", "de"),
    (2L, "good morning everyone nice weather today", "en"),
    (3L, "buenos días señora muchas gracias", "es"),
    (4L, "bonjour merci beaucoup madame", "fr"),
    (5L, "今天天气很好我们去散步然后吃饭", "zh"))

  test("beats the lexicon on planted short stopword-free docs") {
    val df = planted.toDF("doc_id", "text", "truth")
      .withColumn("lex", Text.langId(col("text")))
      .withColumn("ngram", LangIdNgram.langIdNgram(col("text")))
    val rows = df.orderBy("doc_id").collect()
    rows.foreach { r =>
      assert(r.getAs[String]("ngram") == r.getAs[String]("truth"),
        s"ngram mispredicted: $r")
      assert(r.getAs[String]("lex") == "und",
        s"fixture drift: the lexicon now hits ${r.getAs[String]("text")} — " +
          "pick planted docs the lexicon misses or the comparison is vacuous")
    }
  }

  test("mixed-language doc goes to the dominant language, never und") {
    // one French function word inside an English sentence — lexicons
    // can tie or flip on single hits; trigram mass must say English
    val pred = Seq((1L, "the weather report says la pluie is coming tomorrow"))
      .toDF("doc_id", "text")
      .select(LangIdNgram.langIdNgram(col("text")).as("p"))
      .head().getString(0)
    assert(pred == "en", pred)
  }

  test("short and empty texts return und, not a crash or a guess") {
    val preds = Seq((1L, ""), (2L, "ab"), (3L, "x"))
      .toDF("doc_id", "text")
      .select(LangIdNgram.langIdNgram(col("text")).as("p"))
      .collect().map(_.getString(0)).toSeq
    assert(preds == Seq("und", "und", "und"), preds)
  }

  test("scores are deterministic integers matching a JVM-side recompute") {
    // recompute one planted doc's de-score on the driver from the same
    // fixture — proves the Column chain implements the documented model
    val (langs, weights) = LangIdNgram.loadWeights()
    assert(langs == langs.sorted && langs.contains("de"), langs)
    val text = planted.head._2.toLowerCase
    val expected = (0 to text.length - 3).map { i =>
      val tri = text.substring(i, i + 3)
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(tri.getBytes("UTF-8"))
      val hex = md.take(2).map("%02x".format(_)).mkString.take(3)
      weights("de")(Integer.parseInt(hex, 16))
    }.map(_.toLong).sum
    val got = planted.take(1).toDF("doc_id", "text", "truth")
      .select(LangIdNgram.score(
        LangIdNgram.trigramBuckets(col("text")), "de").as("s"))
      .head().getLong(0)
    assert(got == expected, s"spark=$got jvm=$expected")
    assert(got > 0, "planted de doc must carry positive de evidence")
  }

  test("scoring plan is map-only: no exchange before the final sort") {
    val docs = planted.toDF("doc_id", "text", "truth")
    val bucketed = docs.select(col("doc_id"),
      LangIdNgram.trigramBuckets(col("text")).as("b3"))
    val scored = bucketed.select(col("doc_id") +:
      LangIdNgram.languages.map(l =>
        LangIdNgram.score(col("b3"), l).as(s"s_$l")): _*)
    val p = scored.queryExecution.executedPlan.toString
    assert(!p.contains("Exchange"), p)
  }

  test("explicit weights override pointing nowhere fails by name") {
    val e = intercept[IllegalArgumentException](
      LangIdNgram.resolveWeightsPath(
        Map("GRAFT_LANGID_WEIGHTS" -> "/no/such/weights.tsv")))
    assert(e.getMessage.contains("GRAFT_LANGID_WEIGHTS"))
    // no env: resolves the repo fixture or the bundled classpath copy
    val resolved = LangIdNgram.resolveWeightsPath(Map.empty)
    assert(resolved.endsWith("trigram_weights.tsv") ||
      resolved == LangIdNgram.ClasspathWeights, resolved)
  }
}
