package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Driver-run benchmark: one JSON line with per-query wall seconds at
  * SPARK_GRAFT_SF_DIR. Queries execute into the noop datasource so every
  * projected column is actually computed — a bare count() would let
  * Catalyst prune the expensive expressions and under-report. A tiny
  * warm-up action runs first so JVM/codegen startup isn't charged to
  * whichever query happens to run first.
  *
  * A second phase re-runs a headline subset at ~sf1 to expose super-linear
  * queries early: the sf1 input is synthesized once (cached under
  * SPARK_GRAFT_SF1_DIR, default /tmp/graft_sf1) by replicating the sf0.1
  * tables 10× with entity keys shifted per replica — join fan-outs and
  * group cardinalities scale like a real sf1, while fixed dims
  * (nation/region) stay fixed, as TPC-H itself scales. Disable with
  * SPARK_GRAFT_SF1=0.
  */
object Bench {

  /** Entity-key columns that grow with scale factor (nation/region stay
    * fixed-size, so their keys — including FKs to them — never shift). */
  private val ShiftCols: Map[String, Seq[String]] = Map(
    "customer" -> Seq("c_custkey"),
    "orders" -> Seq("o_orderkey", "o_custkey"),
    "lineitem" -> Seq("l_orderkey", "l_partkey", "l_suppkey"),
    "part" -> Seq("p_partkey"),
    "supplier" -> Seq("s_suppkey"),
    "documents" -> Seq("doc_id"),
    "embeddings" -> Seq("vec_id"),
    "events" -> Seq("event_id", "user_id"),
    "nation" -> Seq.empty,
    "region" -> Seq.empty)

  private val KeyStride = 100000000L // replica r shifts keys by r * stride

  /** Headline subset for the sf1 point: one representative per family
    * (scan-agg, joins, filter-scan, pattern agg, window, dedup exact +
    * minhash, native fingerprint, ANN, text hygiene, canonicalization). */
  private val Sf1Queries: Seq[String] = Seq(
    "q_tpch_q1", "q_tpch_q3", "q_tpch_q6", "q_pattern_agg", "q_star_join",
    "q_session_stats", "q_dedup_exact", "q_doc_fingerprint",
    "q_dedup_minhash", "q_ann_cosine", "q_dedup_embedding_lsh",
    "q_quality_filter", "q_repetition", "q_pii_scrub", "q_contamination",
    "q_dedup_components")

  /** Replicate sf0.1 into a ~sf1 directory, once (marker-gated). */
  private def buildSf1(spark: SparkSession, srcDir: String, dstDir: String,
                       replicas: Int): Unit = {
    val marker = java.nio.file.Paths.get(dstDir, "_BUILT")
    if (java.nio.file.Files.exists(marker)) return
    // events is TIMESTAMP(NANOS): read raw (ts as long) and write the long
    // back so graft.sources.Tables.events keeps working on the copy.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    ShiftCols.foreach { case (table, keys) =>
      val src = spark.read.parquet(s"$srcDir/$table.parquet")
      val replicated =
        if (keys.isEmpty) src
        else (0 until replicas).map { r =>
          keys.foldLeft(src)((d, k) => d.withColumn(k, col(k) + lit(r * KeyStride)))
        }.reduce(_ unionByName _)
      replicated.write.mode("overwrite").parquet(s"$dstDir/$table.parquet")
    }
    java.nio.file.Files.createFile(marker)
  }

  private def timeQueries(spark: SparkSession, dir: String,
                          names: Seq[String]): Seq[(String, Double)] =
    names.map { name =>
      val fn = SparkEntry.queries(name)
      val t0 = System.nanoTime()
      try fn(spark, dir).write.mode("overwrite").format("noop").save()
      catch { case e: Throwable =>
        System.err.println(s"[bench] $name failed: ${e.getMessage}")
      }
      val dt = (System.nanoTime() - t0) / 1e9
      // Operators persist intermediate indexes (Dedup); drop them so later
      // queries aren't measured under another query's cache pressure.
      spark.catalog.clearCache()
      name -> dt
    }

  private def toJson(results: Seq[(String, Double)]): String =
    results.map { case (k, v) => "\"" + k + "\":" + v }.mkString("{", ",", "}")

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000).selectExpr("sum(id)").collect() // JVM warm-up
    spark.read.parquet(s"$sfDir/nation.parquet").count() // IO warm-up
    // SPARK_GRAFT_ONLY=q_a,q_b: iterate on a subset (skips the sf1 phase)
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(',').toSet)
    val names = SparkEntry.queries.keys.toSeq.sorted
      .filter(n => only.forall(_.contains(n)))
    val results = timeQueries(spark, sfDir, names)
    val total = results.map(_._2).sum

    val sf1Json =
      if (sys.env.get("SPARK_GRAFT_SF1").contains("0") || only.isDefined) ""
      else {
        // cache key includes the source SF so an sf0.01 iteration run can't
        // poison the driver's sf0.1 bench with a stale small copy
        val srcTag = java.nio.file.Paths.get(sfDir).getFileName.toString
        val sf1Dir = sys.env.getOrElse("SPARK_GRAFT_SF1_DIR", s"/tmp/graft_x10_$srcTag")
        val tBuild0 = System.nanoTime()
        buildSf1(spark, sfDir, sf1Dir, replicas = 10)
        val buildSec = (System.nanoTime() - tBuild0) / 1e9
        // Warm pass: pull every sf1 table through the page cache before the
        // timed window, so the first query isn't charged the cold read of
        // the freshly built replica set (measured as an implausible 68 s on
        // an otherwise sub-second scan-agg). events is TIMESTAMP(NANOS), so
        // the raw read needs the legacy flag even when the build was skipped.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        ShiftCols.keys.foreach { t =>
          spark.read.parquet(s"$sf1Dir/$t.parquet").count()
        }
        val sf1Results = timeQueries(spark, sf1Dir, Sf1Queries)
        val sf1Total = sf1Results.map(_._2).sum
        s""","sf1":{"dir":"$sf1Dir","build_sec":$buildSec,"total":$sf1Total,"queries":${toJson(sf1Results)}}"""
      }

    val line =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":${toJson(results)},"sf":"$sfDir"$sf1Json}"""
    println(line)
    // Also persist the full line: the driver's stdout tail-capture truncated
    // a round's artifact once; the file is the complete record.
    try java.nio.file.Files.writeString(
      java.nio.file.Paths.get(
        sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "bench_out.json")), line + "\n")
    catch { case e: Throwable =>
      System.err.println(s"[bench] bench_out.json write failed: ${e.getMessage}")
    }
    spark.stop()
  }
}
