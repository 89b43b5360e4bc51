package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StringType, StructType}

/** Line-oriented text sources — the formats raw corpus drops actually
  * arrive in (JSONL exports, CSV dumps) before they are converted to
  * parquet ([[Sinks.partitionedParquet]]).
  *
  * Two scale rules, both non-negotiable at 100 TB:
  *
  *  - EXPLICIT schema, never inference: `inferSchema`/sampled JSON schema
  *    detection is a full extra read of the input (and nondeterministic
  *    under sampling — two runs can disagree on a column's type);
  *  - PERMISSIVE parsing with a corrupt-record column, never FAILFAST:
  *    one malformed line among billions must quarantine, not kill the
  *    job at hour nine; DROPMALFORMED is worse — it deletes evidence
  *    silently. [[quarantine]] splits the read into (clean, bad) so the
  *    pipeline can count, inspect, and re-parse the bad side.
  */
object TextSources {

  val CorruptCol = "_graft_corrupt"

  /** Register the zstd Hadoop codec on this session's Hadoop conf so
    * `.json.zstd` shards ([[Sinks.jsonlShards]]'s default) decompress on
    * READ. Spark's text-source shortname table has no zstd entry; the
    * codec class (parquet-hadoop's `ZstandardCodec`, backed by zstd-jni —
    * both on every Spark classpath) must sit in `io.compression.codecs`,
    * and a session that never WROTE a shard has no reason to have put it
    * there. Idempotent; called by every text read below, and public for
    * sessions that read shards through plain `spark.read`. */
  def registerZstd(spark: SparkSession): Unit = {
    val cls = "org.apache.parquet.hadoop.codec.ZstandardCodec"
    val conf = spark.sparkContext.hadoopConfiguration
    val registered = conf.get("io.compression.codecs", "")
    if (!registered.contains(cls))
      conf.set("io.compression.codecs",
        if (registered.isEmpty) cls else s"$registered,$cls")
  }

  /** JSON-lines read: one JSON object per line, explicit schema, corrupt
    * lines captured raw in [[CorruptCol]]. */
  def jsonl(spark: SparkSession, path: String, schema: StructType): DataFrame = {
    registerZstd(spark)
    spark.read
      .schema(schema.add(CorruptCol, StringType))
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", CorruptCol)
      .json(path)
  }

  /** CSV read with the same contract (multiline off: a row = a line, so
    * the input stays splittable by byte range). */
  def csv(spark: SparkSession, path: String, schema: StructType,
          header: Boolean = true): DataFrame =
    spark.read
      .schema(schema.add(CorruptCol, StringType))
      .option("header", header)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", CorruptCol)
      .option("multiLine", false)
      .csv(path)

  /** (clean rows without the corrupt column, quarantined rows with the
    * raw line as `raw_line`). The parsed frame is cached through the
    * [[graft.operators.Caches]] registry first — Spark refuses any raw-
    * file query whose scan would reference ONLY the corrupt-record column
    * (UNSUPPORTED_FEATURE.QUERY_ONLY_CORRUPT_RECORD_COLUMN), and the
    * documented remedy is exactly this: materialize the parse once, serve
    * both splits from the cache. One read of the input instead of two is
    * what you'd want at scale anyway; callers release the block via
    * `Caches.unpersistScope("sources")` once both sides are consumed. */
  def quarantine(df: DataFrame): (DataFrame, DataFrame) = {
    val parsed = graft.operators.Caches.tracked(df, "sources")
    (parsed.filter(col(CorruptCol).isNull).drop(CorruptCol),
      parsed.filter(col(CorruptCol).isNotNull)
        .withColumnRenamed(CorruptCol, "raw_line"))
  }
}
