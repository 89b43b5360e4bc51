package graft.tools

import org.apache.spark.scheduler._
import org.apache.spark.sql.SparkSession

/** Scratch profiler: stage-level timeline of q_dedup_minhash_incr_fast. */
object ProfileIncr {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val stages = new scala.collection.mutable.ArrayBuffer[(Int, String, Long, Long, Int)]
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        stages += ((si.stageId, si.name.takeWhile(_ != '\n').take(60),
          si.submissionTime.getOrElse(0L), si.completionTime.getOrElse(0L),
          si.numTasks))
      }
    })
    val dir = "/root/testdata/sf0.1"
    def run(): Double = {
      val t0 = System.nanoTime()
      graft.SparkEntry.queries("q_dedup_minhash_incr_fast")(spark, dir)
        .write.format("noop").mode("overwrite").save()
      graft.operators.Caches.unpersistAll()
      (System.nanoTime() - t0) / 1e9
    }
    val w1 = run(); val w2 = run()
    stages.clear()
    val t = run()
    Thread.sleep(500)
    println(f"warm1=$w1%.2f warm2=$w2%.2f timed=$t%.2f")
    val sorted = stages.sortBy(_._3)
    val base = sorted.headOption.map(_._3).getOrElse(0L)
    sorted.foreach { case (id, name, sub, comp, n) =>
      println(f"stage $id%4d [+${(sub - base) / 1000.0}%6.2fs .. +${(comp - base) / 1000.0}%6.2fs] ${comp - sub}%5d ms $n%3d tasks  $name")
    }
    spark.stop()
  }
}
