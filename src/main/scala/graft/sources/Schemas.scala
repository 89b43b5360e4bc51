package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** S3/J6: schema introspection as data (reference `DESCRIBE TABLE` probe,
  * `utils/data_acquisition.py:250-293`, and the pattern↔schema join the
  * LLM prompt builder does, `utils/ai_suggester.py:56-63`).
  *
  * Spark already knows every schema (`df.schema`); this just reifies the
  * catalog into a small DataFrame `(table_name, column_name, column_type)`
  * so it can broadcast-join against pattern tables — replacing the
  * reference's per-table network round-trips. */
object Schemas {

  def describeTables(spark: SparkSession, dir: String,
                     tables: Seq[String]): DataFrame = {
    import spark.implicits._
    tables.flatMap { t =>
      Tables.load(spark, dir, t).schema.fields.map(f =>
        (t, f.name, f.dataType.simpleString))
    }.toDF("table_name", "column_name", "column_type")
  }

  /** S3 at full DESCRIBE depth: the reference's 7-field column descriptor
    * (`utils/data_acquisition.py:250-293`: name, type, default_type,
    * default_expression, comment, codec_expression, ttl_expression).
    * Parquet/Spark carry name, type, nullability and a comment in field
    * metadata; ClickHouse-specific codec/TTL expressions have no parquet
    * equivalent and surface as empty strings, exactly as ClickHouse's own
    * DESCRIBE does for columns without them. */
  def describeTablesFull(spark: SparkSession, dir: String,
                         tables: Seq[String]): DataFrame = {
    import spark.implicits._
    tables.flatMap { t =>
      Tables.load(spark, dir, t).schema.fields.map { f =>
        val comment = if (f.metadata.contains("comment")) f.metadata.getString("comment") else ""
        val typ = if (f.nullable) s"Nullable(${f.dataType.simpleString})" else f.dataType.simpleString
        (t, f.name, typ, "", "", comment, "", "")
      }
    }.toDF("table_name", "column_name", "column_type", "default_type",
      "default_expression", "comment", "codec_expression", "ttl_expression")
  }

  /** J6: attach each pattern's accessed-table schemas (broadcast join). */
  def joinPatternSchemas(patterns: DataFrame, schemas: DataFrame): DataFrame =
    patterns.select(col("pattern_id"), explode(col("tables_accessed")).as("table_name"))
      .join(broadcast(schemas), Seq("table_name"), "left")
}
