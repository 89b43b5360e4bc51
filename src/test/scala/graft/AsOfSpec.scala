package graft

import graft.operators.AsOf

class AsOfSpec extends SparkSpec {
  import spark.implicits._

  private val quotes = Seq(
    ("A", 10L, 100.0), ("A", 20L, 110.0), ("A", 30L, 120.0),
    ("B", 15L, 50.0)).toDF("sym", "t", "px")
  private val trades = Seq(
    ("A", 5L), ("A", 10L), ("A", 25L), ("A", 99L),
    ("B", 14L), ("C", 1L)).toDF("sym", "t")

  test("backward as-of picks latest right row with ts <= left ts") {
    val got = AsOf.joinBackward(trades, quotes, Seq("sym"), "t", "t", Seq("px"))
      .collect().map(r => (r.getString(0), r.getLong(1),
        Option(r.get(2)).map(_.asInstanceOf[Double]))).toSet
    assert(got == Set(
      ("A", 5L, None),          // before any quote
      ("A", 10L, Some(100.0)),  // simultaneous quote matches (<=)
      ("A", 25L, Some(110.0)),  // latest earlier quote
      ("A", 99L, Some(120.0)),  // carried far forward
      ("B", 14L, None),         // other key, before its quote
      ("C", 1L, None)))         // key with no right rows at all
  }

  test("left columns pass through unchanged and prefix applies") {
    val out = AsOf.joinBackward(trades, quotes, Seq("sym"), "t", "t",
      Seq("px", "t"), prefix = "q_")
    assert(out.columns.toSeq == Seq("sym", "t", "q_px", "q_t"))
    assert(out.count() == trades.count())
  }
}
