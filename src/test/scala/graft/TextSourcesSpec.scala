package graft

import graft.sources.TextSources
import org.apache.spark.sql.types.{LongType, StringType, StructType}

class TextSourcesSpec extends SparkSpec {

  private val schema = new StructType()
    .add("doc_id", LongType).add("text", StringType).add("lang", StringType)

  test("jsonl: explicit schema, corrupt line quarantined not fatal") {
    val dir = java.nio.file.Files.createTempDirectory("jsonl_src")
    val f = dir.resolve("part0.jsonl")
    java.nio.file.Files.writeString(f,
      """{"doc_id": 1, "text": "hello world", "lang": "en"}
        |{"doc_id": 2, "text": "guten tag", "lang": "de"}
        |{not valid json at all
        |{"doc_id": 3, "text": "bonjour", "lang": "fr"}
        |""".stripMargin)
    val (clean, bad) = TextSources.quarantine(
      TextSources.jsonl(spark, dir.toString, schema))
    assert(clean.count() == 3)
    assert(clean.columns.toSeq == Seq("doc_id", "text", "lang"))
    val badLines = bad.select("raw_line").collect().map(_.getString(0))
    assert(badLines.length == 1 && badLines.head.startsWith("{not valid"))
  }

  test("csv: header honored, malformed row quarantined with raw content") {
    val dir = java.nio.file.Files.createTempDirectory("csv_src")
    val f = dir.resolve("part0.csv")
    java.nio.file.Files.writeString(f,
      """doc_id,text,lang
        |1,hello world,en
        |not_a_number,broken row,xx
        |3,bonjour,fr
        |""".stripMargin)
    val (clean, bad) = TextSources.quarantine(
      TextSources.csv(spark, dir.toString, schema))
    assert(clean.count() == 2)
    assert(clean.collect().map(_.getLong(0)).toSet == Set(1L, 3L))
    val badLines = bad.select("raw_line").collect().map(_.getString(0))
    assert(badLines.length == 1 && badLines.head.startsWith("not_a_number"))
  }
}
