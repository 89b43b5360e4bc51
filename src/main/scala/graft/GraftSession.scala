package graft

import org.apache.spark.sql.SparkSession

/** ONE definition site for the engine's local-session defaults — every
  * entrypoint (Bench, Verify, Explain, Profile, Cli) builds through this
  * (r19, the r18 verdict's ask #6: the r18 driver-overhead caps lived as
  * three copies inside the harness, so every round-over-round engine
  * number carried a non-code tailwind that was hard to attribute; an
  * engine-owned session default is auditable in one place).
  *
  * The driver-overhead caps (r18, measured): Spark stringifies every SQL
  * execution's FULL plan on the driver thread (SQLExecution.
  * withNewExecutionId → explainString(uiExplainMode), default mode
  * `formatted`), AGAIN on every AQE stage materialization
  * (AdaptiveSparkPlanExec.onUpdatePlan), and SQLAppStatusListener —
  * installed even with the UI off — RETAINS the last 1000 executions'
  * full descriptions + metric graphs. Over a long-lived session
  * (~160 bench queries × warm+2 iters × several actions each, or a
  * serving daemon / notebook on a real cluster) the retained strings
  * grow the old-gen working set: the r18 baseline measured q_tpch_q1
  * (unchanged since r8) at 2.86 s INSIDE the full run vs 1.44 s isolated
  * on the same box — a 2× session-aging tax the pure-CPU calibration
  * sentinel cannot see (it allocates nothing). `simple` explain mode
  * cuts the per-action stringify work itself; the retained-counts bound
  * the status stores. Revert per-session when a live UI is actually
  * attached. */
object GraftSession {

  /** Builder with the shared defaults applied; callers may override or
    * add configs before `getOrCreate()`. `cpus` sets both the local
    * master's core count and the shuffle-partition default (local-mode
    * sizing only — production deployments set their own master and
    * derive shuffle partitions from input size / AQE coalescing). */
  def builder(cpus: String): SparkSession.Builder = {
    val b = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
    // GRAFT_SESSION_CAPS escape hatch: "0" disables every cap (the
    // live-UI / diagnosis case the scaladoc names), "sql" applies only
    // the SQL-side caps (plan stringify + retained executions — the
    // mechanism the r18 session-aging measurement pinned) and leaves
    // the job/stage/task stores at Spark defaults. Default: all caps.
    sys.env.getOrElse("GRAFT_SESSION_CAPS", "all") match {
      case "0" => b
      case "exec8" => // single-cap isolation (measurement use)
        b.config("spark.sql.ui.retainedExecutions", "8")
      case "simple" => // single-cap isolation (measurement use)
        b.config("spark.sql.ui.explainMode", "simple")
      case "sql" =>
        b.config("spark.sql.ui.retainedExecutions", "8")
          .config("spark.sql.ui.explainMode", "simple")
      case _ =>
        b.config("spark.sql.ui.retainedExecutions", "8")
          .config("spark.sql.ui.explainMode", "simple")
          .config("spark.ui.retainedJobs", "200")
          .config("spark.ui.retainedStages", "200")
          .config("spark.ui.retainedTasks", "2000")
    }
  }

  /** Build-and-init: the common tail every entrypoint repeated. */
  def create(cpus: String): SparkSession = {
    val s = builder(cpus).getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
