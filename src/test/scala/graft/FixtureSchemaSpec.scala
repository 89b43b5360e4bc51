package graft

import graft.sources.Tables
import org.apache.spark.sql.types._

/** Guard against driver fixture regeneration drift (round-7 incident: the
  * regenerated events.parquet switched TIMESTAMP(NANOS) → TIMESTAMP(MICROS)
  * and the unconditional nanos workaround crashed 35 queries). These tests
  * load `events` through the production adapter at every shipped SF and
  * assert the normalized schema, so any future physical-type change fails
  * HERE, by name, instead of at analysis time in a third of the suite. */
class FixtureSchemaSpec extends SparkSpec {

  private val sfDirs = Seq("sf0.001", "sf0.01", "sf0.1")
    .map(sf => s"/root/testdata/$sf")
    .filter(d => new java.io.File(d, "events.parquet").exists())

  test("events fixture exists at at least one SF") {
    assert(sfDirs.nonEmpty, "no /root/testdata/sf*/events.parquet found")
  }

  test("Tables.events normalizes ts to TimestampType at every SF") {
    sfDirs.foreach { dir =>
      val ev = Tables.events(spark, dir)
      assert(ev.schema("ts").dataType == TimestampType,
        s"$dir: ts is ${ev.schema("ts").dataType}, expected TimestampType")
      // Analysis alone is not enough — force one row through the physical
      // plan so a reader-level failure (e.g. PARQUET_TYPE_ILLEGAL) surfaces.
      assert(ev.limit(1).count() == 1L, s"$dir: events read produced no rows")
    }
  }

  test("incr-minhash corpus stays flood-free: every LSH bucket under LshMaxBucket") {
    // The ingestion queries cap (band, bh) buckets at LshMaxBucket while
    // their DuckDB oracle mirrors the uncapped algebra — parity therefore
    // assumes the fixture corpus never floods a bucket. Assert it by
    // name at every shipped SF so a regeneration that plants >64
    // near-identical docs fails HERE, not as an opaque oracle mismatch.
    import org.apache.spark.sql.functions._
    sfDirs.filter(d => new java.io.File(d, "documents.parquet").exists())
      .foreach { dir =>
        val (store, batch) = SparkEntry.incrMinhashCorpus(spark, dir)
        val sigs = graft.operators.Dedup.minhashSignaturesPortable(
          store.unionByName(batch), "doc_id", "text", 16, 5)
        val maxBucket = graft.operators.Dedup.bandedPortable(sigs, 16, 8)
          .groupBy("band", "bh").count()
          .agg(max("count")).head().getLong(0)
        assert(maxBucket <= graft.operators.Dedup.LshMaxBucket,
          s"$dir: hottest LSH bucket holds $maxBucket docs — over the " +
            s"${graft.operators.Dedup.LshMaxBucket} cap; the capped Spark " +
            "path and the uncapped oracle would diverge")
      }
  }

  test("incr-minhash corpus has no pair in the est-Jaccard dead band under either family") {
    // q_dedup_minhash_incr_fast (xxhash64, 32 hashes) reuses the md5
    // 16-hash twin's oracle on the premise that keep sets are
    // hash-family-invariant for this corpus: near-copies estimate ≈0.9+,
    // unrelated banded collisions ≈0, and the 0.3 policy threshold sits
    // in the empty middle. That premise dies silently if a fixture
    // regeneration plants borderline pairs (short docs near est 0.3) —
    // surfacing as an opaque oracle mismatch or, worse, masking a
    // fast-path bug that coincidentally matches. Assert the dead band
    // [0.2, 0.4] is EMPTY for every banded candidate pair under BOTH
    // families, at every shipped SF, so the drift fails here by name.
    import org.apache.spark.sql.functions._
    import graft.operators.Dedup
    try sfDirs.filter(d => new java.io.File(d, "documents.parquet").exists())
      .foreach { dir =>
        val (store, batch) = SparkEntry.incrMinhashCorpus(spark, dir)
        val corpus = store.unionByName(batch)
        def deadBand(cand: org.apache.spark.sql.DataFrame): Long =
          cand.filter(col("est_jaccard") >= 0.2 && col("est_jaccard") <= 0.4)
            .count()
        val sigsP = Dedup.minhashSignaturesPortable(corpus, "doc_id", "text", 16, 5)
        val nP = deadBand(Dedup.bandedCandidates(
          Dedup.bandedPortable(sigsP, 16, 8), sigsP, 16, 0.0, Int.MaxValue))
        assert(nP == 0,
          s"$dir: $nP md5-family candidate pairs estimate inside [0.2,0.4]")
        val sigsF = Dedup.minhashSignatures(corpus, "doc_id", "text", 32, 5)
        val nF = deadBand(Dedup.bandedCandidates(
          Dedup.bandedXxhash(sigsF, 32, 8), sigsF, 32, 0.0, Int.MaxValue))
        assert(nF == 0,
          s"$dir: $nF xxhash64-family candidate pairs estimate inside [0.2,0.4]")
      }
    finally graft.operators.Dedup.unpersistIntermediates()
  }

  test("normalizeEventTs handles all three historical ts physical types") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // INT64 nanos (nanosAsLong path): 1.5e9 s * 1e9 ns
    val nanos = Seq(1500000000000000000L).toDF("ts")
    val fromNanos = Tables.normalizeEventTs(nanos)
    assert(fromNanos.schema("ts").dataType == TimestampType)
    assert(fromNanos.select(unix_millis(col("ts"))).as[Long].head() == 1500000000000L)
    // TIMESTAMP_NTZ (current fixture): same instant, session is UTC
    val ntz = Seq(1500000000000L).toDF("ms")
      .select(timestamp_micros(col("ms") * 1000).cast(TimestampNTZType).as("ts"))
    val fromNtz = Tables.normalizeEventTs(ntz)
    assert(fromNtz.schema("ts").dataType == TimestampType)
    assert(fromNtz.select(unix_millis(col("ts"))).as[Long].head() == 1500000000000L)
    // TIMESTAMP (already session-zoned): pass-through
    val ltz = Seq(1500000000000L).toDF("ms")
      .select(timestamp_micros(col("ms") * 1000).as("ts"))
    assert(Tables.normalizeEventTs(ltz).schema("ts").dataType == TimestampType)
    // the NTZ cast is value-identical only under UTC — a misconfigured
    // session must fail by name, not shift every event timestamp
    spark.conf.set("spark.sql.session.timeZone", "Europe/Berlin")
    try intercept[IllegalArgumentException] { Tables.normalizeEventTs(ntz) }
    finally spark.conf.set("spark.sql.session.timeZone", "UTC")
    // Anything else is a loud failure, not a silent mis-read
    intercept[IllegalStateException] {
      Tables.normalizeEventTs(Seq("x").toDF("ts"))
    }
  }
}
