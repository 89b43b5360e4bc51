package graft

import graft.operators.Joins
import graft.sources.Tables
import org.apache.spark.sql.functions._

class JoinsSpec extends SparkSpec {

  test("salted equi-join equals the plain join (inner and left)") {
    val li = Tables.lineitem(spark, sf0001).select("l_orderkey", "l_linenumber", "l_quantity")
    val o = Tables.orders(spark, sf0001).select("o_orderkey", "o_orderstatus")
      .withColumnRenamed("o_orderkey", "l_orderkey")
    for (jt <- Seq("inner", "left")) {
      val plain = li.join(o, Seq("l_orderkey"), jt)
        .orderBy("l_orderkey", "l_linenumber").collect().toSeq
      val salted = Joins.saltedEquiJoin(li, o, "l_orderkey",
        saltSource = col("l_linenumber"), saltBuckets = 8, joinType = jt)
        .orderBy("l_orderkey", "l_linenumber").collect().toSeq
      assert(salted == plain, s"join type $jt diverged")
    }
  }
}
