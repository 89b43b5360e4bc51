package graft

import graft.functions.Scrub
import graft.operators.{Contamination, Repetition}
import org.apache.spark.sql.functions._

/** Hand-computed cases for the text-hygiene trio: PII scrubbing,
  * Gopher-style repetition metrics, benchmark decontamination. */
class TextHygieneSpec extends SparkSpec {
  import spark.implicits._

  test("scrub redacts URL before email/IP so nested matches don't leak") {
    val line = "visit https://x.example/a?e=b@c.com or mail joe@x.org from 192.168.1.1 now"
    val out = Seq(line).toDF("line")
      .select(Scrub.scrub(col("line")).as("s"),
        Scrub.countMatches(col("line"), Scrub.EmailRe).as("ne"),
        Scrub.countMatches(col("line"), Scrub.UrlRe).as("nu"),
        Scrub.countMatches(col("line"), Scrub.Ipv4Re).as("ni"))
      .head()
    assert(out.getAs[String]("s") == "visit <URL> or mail <EMAIL> from <IP> now")
    // counts run on the RAW line: the in-URL b@c.com counts as an email hit
    assert(out.getAs[Long]("ne") == 2L)
    assert(out.getAs[Long]("nu") == 1L)
    assert(out.getAs[Long]("ni") == 1L)
  }

  test("repetition metrics on a maximally repetitive doc") {
    // "a b a b a b": 6 tokens, 2 distinct; bigrams "a b"×3 "b a"×2;
    // trigrams "a b a"×2 "b a b"×2 → dup frac (1+1)/4 = 0.5
    val docs = Seq((1L, "a b a b a b")).toDF("doc_id", "text")
    val r = Repetition.ngramRepetition(docs, "doc_id", "text").head()
    assert(r.getAs[Long]("n_tokens") == 6L)
    assert(r.getAs[Long]("n_distinct_tokens") == 2L)
    assert(r.getAs[String]("top_bigram") == "a b")
    assert(r.getAs[Long]("top_bigram_count") == 3L)
    assert(math.abs(r.getAs[Double]("top_bigram_char_frac") - 9.0 / 11.0) < 1e-12)
    assert(r.getAs[Double]("dup_trigram_frac") == 0.5)
  }

  test("repetition metrics: no repeats and tie-break to smallest gram") {
    val docs = Seq((1L, "one two three four")).toDF("doc_id", "text")
    val r = Repetition.ngramRepetition(docs, "doc_id", "text").head()
    assert(r.getAs[Long]("n_tokens") == 4L)
    assert(r.getAs[Long]("n_distinct_tokens") == 4L)
    // all bigrams count 1 → lexicographically smallest wins
    assert(r.getAs[String]("top_bigram") == "one two")
    assert(r.getAs[Long]("top_bigram_count") == 1L)
    assert(r.getAs[Double]("dup_trigram_frac") == 0.0)
  }

  test("repetition metrics degenerate for docs shorter than the gram order") {
    val docs = Seq((1L, "Hello")).toDF("doc_id", "text")
    val r = Repetition.ngramRepetition(docs, "doc_id", "text").head()
    assert(r.getAs[Long]("n_tokens") == 1L)
    assert(r.getAs[String]("top_bigram") == "hello")
    assert(r.getAs[Long]("top_bigram_count") == 1L)
    assert(r.getAs[Double]("dup_trigram_frac") == 0.0)
  }

  test("contamination flags only corpus docs sharing an n-gram with bench") {
    val corpus = Seq(
      (10L, "alpha beta gamma delta epsilon zeta"), // shares 3-grams with bench 1
      (11L, "alpha beta gamma delta epsilon zeta"), // identical → same overlap
      (12L, "totally disjoint text with no shared phrases at all"))
      .toDF("doc_id", "text")
    val bench = Seq(
      (1L, "prefix words alpha beta gamma delta suffix"))
      .toDF("doc_id", "text")
    val out = Contamination.overlap(corpus, bench, "doc_id", "text", n = 3)
      .orderBy("doc_id").collect()
    assert(out.map(_.getAs[Long]("doc_id")).toSeq == Seq(10L, 11L))
    // shared 3-grams: "alpha beta gamma", "beta gamma delta"
    assert(out.forall(_.getAs[Long]("n_shared_shingles") == 2L))
    assert(out.forall(_.getAs[Long]("n_bench_docs") == 1L))
  }

  test("repetition metrics equal a naive recount on random corpora") {
    val rnd = new scala.util.Random(23)
    val vocab = Vector("a", "bb", "ccc", "dd", "e", "fff", "gg")
    val docs = (1L to 40L).map { i =>
      (i, Seq.fill(3 + rnd.nextInt(30))(vocab(rnd.nextInt(vocab.size))).mkString(" "))
    }
    val got = Repetition.ngramRepetition(docs.toDF("doc_id", "text"), "doc_id", "text")
      .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
    docs.foreach { case (id, text) =>
      val toks = text.toLowerCase.trim.split("\\s+").toSeq
      def grams(n: Int) =
        if (toks.length <= n - 1) Seq(toks.mkString(" "))
        else toks.sliding(n).map(_.mkString(" ")).toSeq
      val bi = grams(2).groupBy(identity).view.mapValues(_.size)
      val (topBi, topCount) = bi.toSeq.minBy { case (g, c) => (-c, g) }
      val tri = grams(3).groupBy(identity).view.mapValues(_.size)
      val dupFrac = tri.values.map(_ - 1).sum.toDouble / tri.values.sum.toDouble
      val r = got(id)
      assert(r.getAs[Long]("n_tokens") == toks.size)
      assert(r.getAs[Long]("n_distinct_tokens") == toks.distinct.size)
      assert(r.getAs[String]("top_bigram") == topBi, s"doc $id")
      assert(r.getAs[Long]("top_bigram_count") == topCount)
      assert(math.abs(r.getAs[Double]("dup_trigram_frac") - dupFrac) < 1e-12)
    }
  }

  test("map-only repetition == the shuffled explode+groupBy formulation") {
    val rnd = new scala.util.Random(57)
    val vocab = Vector("aa", "b", "cc c", "dd", "e f", "gg", "hh", "i")
    val docs = (1L to 30L).map { i =>
      (i, Seq.fill(1 + rnd.nextInt(25))(vocab(rnd.nextInt(vocab.size))).mkString(" "))
    }.toDF("doc_id", "text")
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.orderBy("doc_id").collect().map(_.toSeq).toSeq
    assert(rows(Repetition.ngramRepetition(docs, "doc_id", "text")) ==
      rows(Repetition.ngramRepetitionShuffled(docs, "doc_id", "text")))
  }

  test("single-pass native repetition == the composed shingle-array form") {
    // edge mix the generated corpora sweep: empty, whitespace-only,
    // single-token, unicode, ties at max count, docs below the gram order
    val edge = Seq((100L, ""), (101L, "   "), (102L, "solo"),
      (103L, "héllo 日本語 héllo 日本語"), (104L, "a b a b"), (105L, "x y"))
    val rnd = new scala.util.Random(91)
    val vocab = Vector("alpha", "Bb", "ccc", "日本", "émigré", "x1", "the")
    val docs = (edge ++ (1L to 40L).map { i =>
      (i, Seq.fill(rnd.nextInt(28))(vocab(rnd.nextInt(vocab.size))).mkString(" "))
    }).toDF("doc_id", "text")
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.orderBy("doc_id").collect().map(_.toSeq).toSeq
    assert(rows(Repetition.ngramRepetition(docs, "doc_id", "text")) ==
      rows(Repetition.ngramRepetitionComposed(docs, "doc_id", "text")))
  }

  test("scrub is idempotent: redacted text has nothing left to redact") {
    val lines = Seq(
      "mail a@b.co and c.d+x@e-f.org via https://h.example/p?q=1 from 1.2.3.4",
      "no pii here at all",
      "edge http://x.y [email protected] 255.255.255.255 end")
    val df = lines.toDF("line").select(Scrub.scrub(col("line")).as("once"))
      .select(col("once"), Scrub.scrub(col("once")).as("twice"))
    assert(df.filter(col("once") =!= col("twice")).isEmpty)
  }

  test("quality filter: each rule fires on its crafted violator") {
    import graft.operators.QualityFilter
    val good = "the quick brown fox and the lazy dog walk to a small house in " +
      "the field that is green and the sun is warm over it all day long today"
    val docs = Seq(
      (1L, good, "en"),                       // passes everything
      (2L, "short text only here", "en"),     // too_few_tokens
      (3L, good, "zz"),                       // lang_not_allowed
      (4L, ("a " * 40).trim, "en"),           // mean_word_len < 2
      (5L, good.replace(" ", "!! "), "en"))   // high punct, likely low alpha too
      .toDF("doc_id", "text", "lang")
    val out = QualityFilter(docs, "doc_id", "text", "lang")
      .orderBy("doc_id").collect()
    def reasons(i: Int) = out(i).getSeq[String](out(i).fieldIndex("reasons")).toSeq
    assert(out(0).getAs[Boolean]("keep") && reasons(0).isEmpty)
    assert(reasons(1) == Seq("too_few_tokens", "low_stopword_ratio"))
    assert(reasons(2) == Seq("lang_not_allowed"))
    assert(reasons(3).contains("mean_word_len") && !out(3).getAs[Boolean]("keep"))
    assert(reasons(4).contains("high_punct_ratio"))
  }

  test("contamination n-gram order is respected (no overlap at larger n)") {
    val corpus = Seq((10L, "alpha beta gamma other words here")).toDF("doc_id", "text")
    val bench = Seq((1L, "alpha beta gamma different tail tokens")).toDF("doc_id", "text")
    // shared run is only 3 tokens → no shared 4-gram
    assert(Contamination.overlap(corpus, bench, "doc_id", "text", n = 4).isEmpty)
  }

  test("script mix: counts per explicit range, dominant tie-break, edge docs") {
    import graft.plans.ScriptMix
    def mix(s: String): Map[String, Long] = {
      val row = Seq(Tuple1(s)).toDF("text")
        .select(ScriptMix.scriptMix(col("text")).as("sm"))
        .select(ScriptMix.Fields.map(f => col(s"sm.$f").as(f)): _*).head()
      ScriptMix.Fields.zipWithIndex.map { case (f, i) => f -> row.getLong(i) }.toMap
    }
    // one char of each class + punctuation lands in its own bucket
    val m = mix("aÀ 日ひカ Ж Ω م 한ᄀ 7 !")
    assert(m("latin") == 2 && m("cjk") == 3 && m("cyrillic") == 1 &&
      m("greek") == 1 && m("arabic") == 1 && m("hangul") == 2 &&
      m("digit") == 1 && m("other") == 1, m)
    assert(m("space") == 7, m)
    assert(m.values.sum == "aÀ 日ひカ Ж Ω م 한ᄀ 7 !".codePointCount(0,
      "aÀ 日ひカ Ж Ω م 한ᄀ 7 !".length), m)
    // empty and whitespace-only docs
    assert(mix("").values.sum == 0)
    assert(mix(" \t\n") == mix(" \t\n").updated("space", 3L), mix(" \t\n"))
    // supplementary-plane codepoint (outside every listed range) counts
    // ONCE as other, matching numChars/DuckDB length semantics
    val sp = mix("a😀b") // 😀
    assert(sp("latin") == 2 && sp("other") == 1 && sp.values.sum == 3, sp)
    // dominant tie-break mirrors the name-ascending CASE chain: a 2-2
    // latin/cjk tie must pick cjk (earlier name), all-zero → none
    val docs = Seq((1L, "ab日本"), (2L, "!!!"), (3L, "это русский текст"))
      .toDF("doc_id", "text")
    val letters = Seq("arabic", "cjk", "cyrillic", "greek", "hangul", "latin")
    val mx = greatest(letters.map(n => col(s"sm.$n")): _*)
    val domCol = letters.foldLeft(when(mx === 0, lit("none"))) {
      (acc, n) => acc.when(col(s"sm.$n") === mx, lit(n))
    }
    val out = docs.select(col("doc_id"),
        ScriptMix.scriptMix(col("text")).as("sm"))
      .select(col("doc_id"), domCol.as("dominant_script"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out == Map(1L -> "cjk", 2L -> "none", 3L -> "cyrillic"), out)
  }
}
