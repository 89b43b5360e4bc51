package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Join helpers for skew that AQE can't always fix.
  *
  * AQE's skew-join splitting only kicks in for sort-merge joins with
  * oversized partitions it can observe; a pathologically hot key joined
  * against a NON-broadcastable dimension still serializes on one task.
  * [[saltedEquiJoin]] is the classic manual remedy: the fact side gets a
  * random-free salt derived from row identity, the dimension side is
  * replicated `saltBuckets` times, and the join key becomes
  * (key, salt) — splitting each hot key across `saltBuckets` tasks at the
  * cost of a `saltBuckets`× blow-up of the (small) right side.
  */
object Joins {

  /** Inner/left equi-join `left.key == right.key` with the right side
    * replicated per salt bucket. `saltSource` must be deterministic
    * per-row (e.g. a unique id column) so results are reproducible. */
  def saltedEquiJoin(left: DataFrame, right: DataFrame, key: String,
                     saltSource: Column, saltBuckets: Int,
                     joinType: String = "inner"): DataFrame = {
    val saltedLeft = left.withColumn("_salt",
      pmod(xxhash64(saltSource), lit(saltBuckets)).cast("int"))
    val saltedRight = right.withColumn("_salt",
      explode(sequence(lit(0), lit(saltBuckets - 1))))
    saltedLeft.join(saltedRight, Seq(key, "_salt"), joinType).drop("_salt")
  }
}
