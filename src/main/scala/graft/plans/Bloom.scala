package graft.plans

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate

/** Column wrappers for Spark's built-in Bloom-filter expressions
  * (`BloomFilterAggregate` / `BloomFilterMightContain` — the machinery
  * behind AQE's runtime row-level filtering, which Spark does not
  * register as public SQL functions). Both are codegen-friendly engine
  * expressions: the aggregate builds a `util.sketch.BloomFilter` over a
  * LONG column distributively (map-side partial sketches, merged), and
  * the probe tests membership in-row.
  *
  * `BloomFilterMightContain` requires its sketch side to be a CONSTANT
  * (Literal / scalar subquery) — an attribute from a joined 1-row frame
  * is rejected at analysis. [[mightContain]] therefore takes the sketch
  * BYTES (from a driver-side collect of [[bloomAgg]]'s single row) and
  * embeds them as a binary literal, which ships to executors with the
  * task binary exactly once per stage. */
object Bloom {

  /** Aggregate a LONG column into a serialized Bloom sketch (BINARY,
    * one row). `numBits` bounds the sketch size; use
    * `org.apache.spark.util.sketch.BloomFilter.optimalNumOfBits` to size
    * it from expected items and target false-positive rate. */
  def bloomAgg(c: Column, expectedItems: Long, numBits: Long): Column =
    GraftSqlBridge.column(
      new BloomFilterAggregate(GraftSqlBridge.expression(c),
        Literal(expectedItems), Literal(numBits)).toAggregateExpression())

  /** In-row membership probe of a LONG column against a collected
    * sketch. No false negatives; false-positive rate set at build. */
  def mightContain(sketchBytes: Array[Byte], value: Column): Column =
    GraftSqlBridge.column(
      BloomFilterMightContain(Literal(sketchBytes), GraftSqlBridge.expression(value)))
}
