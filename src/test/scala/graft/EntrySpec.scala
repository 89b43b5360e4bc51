package graft

/** Suite-level pin of the driver's t1 contract: `SparkEntry.entry` must
  * return rows on the sf0.001 fixtures. The driver smoke-checks this
  * every round; until now nothing in the suite did, so a regression
  * would only surface in the driver's harness — this makes it fail by
  * name locally first. */
class EntrySpec extends SparkSpec {

  test("entry: flagship analyze query returns rows on sf0.001") {
    val out = SparkEntry.entry(spark)
    assert(out.columns.contains("pattern_id"), out.columns.toSeq)
    assert(out.count() > 0)
    operators.Caches.unpersistAll()
  }
}
