package graft

import graft.functions.Bpe
import org.apache.spark.sql.functions._

class BpeSpec extends SparkSpec {
  import spark.implicits._

  private val toyMerges = Seq(("h", "e"), ("l", "l"), ("he", "ll"), ("hell", "o"))

  test("hand-computed merges: counts match manual BPE") {
    // hello: h e l l o -> (h,e): [he l l o] -> (l,l): [he ll o]
    //   -> (he,ll): [hell o] -> (hell,o): [hello] = 1 token
    // lol: no rule matches (l,o / o,l) = 3
    // pre-token boundaries: merges never cross whitespace/punctuation
    val rows = Seq("hello", "hell", "lol", "hello hello", "hello, world", "")
      .zipWithIndex.map { case (s, i) => (i.toLong, s) }.toDF("id", "text")
      .select(col("id"), Bpe.mergedTokenCount(col("text"), toyMerges).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(rows == Map(0L -> 1L, 1L -> 1L, 2L -> 3L, 3L -> 2L,
      4L -> 7L, // hello(1) + ','(1) + world(5)
      5L -> 0L))
  }

  test("left-to-right non-overlapping merge semantics") {
    val m = Seq(("l", "l"))
    val got = Seq("lll", "llll", "lllll").zipWithIndex
      .map { case (s, i) => (i.toLong, s) }.toDF("id", "text")
      .select(col("id"), Bpe.mergedTokenCount(col("text"), m).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // lll -> [ll, l]=2; llll -> [ll, ll]=2; lllll -> [ll, ll, l]=3
    assert(got == Map(0L -> 2L, 1L -> 2L, 2L -> 3L))
  }

  test("sequential rank-order application equals the priority-queue encoder") {
    // independent reference implementation: classic lowest-rank-first loop
    def priorityBpe(tok: String, merges: Seq[(String, String)]): Int = {
      val rank = merges.zipWithIndex.toMap
      var syms = tok.map(_.toString).toVector
      var done = false
      while (!done && syms.size > 1) {
        val best = syms.zip(syms.tail).zipWithIndex
          .flatMap { case (p, i) => rank.get(p).map(r => (r, i)) }
        if (best.isEmpty) done = true
        else {
          val bestRank = best.map(_._1).min
          val (x, y) = merges(bestRank)
          // merge all occurrences of the best pair, left to right
          val out = Vector.newBuilder[String]
          var j = 0
          while (j < syms.size) {
            if (j + 1 < syms.size && syms(j) == x && syms(j + 1) == y) {
              out += x + y; j += 2
            } else { out += syms(j); j += 1 }
          }
          syms = out.result()
        }
      }
      syms.size
    }
    val merges = Bpe.loadMerges()
    val words = Seq("data", "batch", "scan", "the", "sort", "stream", "join",
      "merge", "small", "window", "thethe", "datadata", "xyzzy", "a")
    val expected = words.map(w => w -> priorityBpe(w, merges).toLong).toMap
    val got = words.zipWithIndex.map { case (w, i) => (i.toLong, w) }
      .toDF("id", "text")
      .select(col("text"), Bpe.mergedTokenCount(col("text"), merges).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == expected, s"got $got expected $expected")
    // fixture sanity: these words merge to single tokens
    assert(Seq("data", "batch", "scan", "the").forall(w => got(w) == 1L))
  }

  test("tokenizer surface: symbol sequences and deterministic ids") {
    val df = Seq((1L, "hello, world")).toDF("id", "text")
      .select(posexplode(Bpe.tokens(col("text"), toyMerges)))
      .select(col("pos"), col("col").as("tok"),
        Bpe.tokenId(col("col"), toyMerges).as("tid"))
    val got = df.collect().map(r => (r.getInt(0), r.getString(1), r.getInt(2))).toSeq
    // vocab ids: he=256, ll=257, hell=258, hello=259; singles = code point
    assert(got == Seq(
      (0, "hello", 259), (1, ",", 44), (2, "w", 119), (3, "o", 111),
      (4, "r", 114), (5, "l", 108), (6, "d", 100)), got.toString)
    // count surface and token surface agree by construction
    val n = Seq((1L, "hello, world")).toDF("id", "text")
      .select(Bpe.mergedTokenCount(col("text"), toyMerges)).head().getLong(0)
    assert(n == got.length.toLong)
  }

  test("loadMerges validates well-formedness") {
    Bpe.validate(toyMerges) // fine
    val bad = Seq(("th", "e")) // 'th' never introduced
    intercept[IllegalArgumentException](Bpe.validate(bad))
    val alsoBad = Seq(("h", "e"), ("e", "he"), ("he", "ehe")) // ok, ok, ok
    Bpe.validate(alsoBad)
    intercept[IllegalArgumentException](
      Bpe.validate(Seq(("h", "e"), ("ll", "o"))))
  }

  test("a set-but-missing GRAFT_BPE_MERGES fails loudly instead of falling back") {
    val e = intercept[IllegalArgumentException](
      Bpe.resolveMergesPath(Map("GRAFT_BPE_MERGES" -> "/no/such/merges.txt")))
    assert(e.getMessage.contains("GRAFT_BPE_MERGES"))
    // a set-and-present override wins over everything
    val tmp = java.nio.file.Files.createTempFile("merges", ".txt")
    try {
      assert(Bpe.resolveMergesPath(
        Map("GRAFT_BPE_MERGES" -> tmp.toString)) == tmp.toString)
    } finally java.nio.file.Files.delete(tmp)
    // unset: resolution falls through to repo fixture / classpath
    val resolved = Bpe.resolveMergesPath(Map.empty)
    assert(resolved == Bpe.ClasspathMerges ||
      java.nio.file.Files.exists(java.nio.file.Paths.get(resolved)))
  }
  test("oracle framing guards fail by name (r15 ADVICE)") {
    // a merge symbol carrying the chr(1) framing byte is unencodable
    val ex = intercept[IllegalArgumentException] {
      Bpe.duckdbMergedCountSql("text", Seq(("\u0001", "a")))
    }
    assert(ex.getMessage.contains("framing control"), ex.getMessage)
    // and the generated SQL carries the corpus-side control-char guard,
    // so chr(1)/chr(2) in TEXT errors by name inside DuckDB itself
    val sql = Bpe.duckdbMergedCountSql("text", Seq(("a", "b")))
    assert(sql.contains("error('graft bpe oracle"), sql)
    assert(graft.operators.BpeTrain.oracleCtes("documents", "text", 1)
      .contains("error('graft bpe oracle"))
    assert(graft.operators.BpeTrain.oracleApplyCtes("documents", "text", 1)
      .contains("error('graft bpe oracle"))
  }
}
