package graft.operators

/** Overlap INDEPENDENT driver-blocking pipelines (optimization guide
  * §2.6: "Spark's scheduler happily runs several jobs at once inside one
  * application; actions are only sequential because your driver code
  * calls them sequentially").
  *
  * Several query paths compose two pipelines that are completely
  * independent until a final fuse/union — IVF coarse training beside PQ
  * codebook training ([[Pq.ivfPqTopK]]), a sparse BM25 ranker beside a
  * dense ANN ranker (the hybrid queries) — and each side runs EAGER
  * driver work at DataFrame-construction time (Lloyd collects, pushTerms
  * collects). Built sequentially, every one of those driver barriers
  * serializes: the cluster sits idle between a Lloyd pass's collect and
  * the next pass's submit while a whole independent pipeline is waiting
  * to even start. Running the two constructions on two threads lets the
  * scheduler interleave their jobs (FIFO back-fill), so wall clock drops
  * toward max(a, b) instead of a + b.
  *
  * Results are UNCHANGED: each side is deterministic and reads only its
  * own inputs; the scheduler's interleaving cannot reorder anything
  * inside a side (jobs within one side still submit sequentially from
  * its own thread). [[Caches]] is synchronized; Spark job submission is
  * thread-safe by design (the guide's §2.6 thread-pool pattern).
  *
  * A plain daemon thread, not a shared pool: sides block on collects for
  * seconds, nesting must not deadlock (a hybrid query's dense side calls
  * [[Pq.ivfPqTopK]], which parallelizes again internally), and one
  * thread per call costs microseconds beside the jobs it overlaps. The
  * primary side runs on the CALLER's thread so thread-local Spark state
  * (job group, description) attaches to at least the caller's jobs; `b`
  * always joins before return — even when `a` throws — so no stray jobs
  * bleed into a neighbor's timing window. */
object Par {
  def both[A, B](a: => A, b: => B): (A, B) = {
    @volatile var out: Either[Throwable, B] = null
    val t = new Thread(() => {
      out = try Right(b) catch { case e: Throwable => Left(e) }
    }, "graft-par")
    t.setDaemon(true)
    t.start()
    val ra = try a finally t.join()
    out.fold(e => throw e, rb => (ra, rb))
  }
}
