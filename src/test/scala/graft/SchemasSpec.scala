package graft

import graft.sources.Schemas

/** S3/J6 schema introspection — catalog-as-data shapes. */
class SchemasSpec extends SparkSpec {

  test("describeTables reifies (table, column, type) rows") {
    val df = Schemas.describeTables(spark, sf0001, Seq("nation", "region"))
    val rows = df.collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(rows.contains(("nation", "n_nationkey")))
    assert(rows.contains(("region", "r_name")))
  }

  test("describeTablesFull carries the 7-field DESCRIBE shape (data_acquisition.py:250-293)") {
    val df = Schemas.describeTablesFull(spark, sf0001, Seq("nation"))
    assert(df.columns.toSeq == Seq("table_name", "column_name", "column_type",
      "default_type", "default_expression", "comment", "codec_expression",
      "ttl_expression"))
    val byCol = df.collect().map(r => r.getAs[String]("column_name") -> r).toMap
    // parquet fields read back nullable -> ClickHouse-style Nullable(T)
    assert(byCol("n_nationkey").getAs[String]("column_type").startsWith("Nullable("))
    // absent metadata surfaces as empty strings, as ClickHouse DESCRIBE does
    assert(byCol("n_name").getAs[String]("codec_expression") == "")
    assert(byCol("n_name").getAs[String]("comment") == "")
  }
}
