package graft.operators

/** Overlap INDEPENDENT Spark actions from driver threads — optimization
  * guide §2.6 ("Overlap independent jobs"): Spark's scheduler happily
  * runs several jobs at once inside one application; composite
  * operators that build several stores were only sequential because the
  * driver called their actions sequentially, leaving most of the
  * cluster idle through each small job's tail and fixed commit
  * overhead. Submitting the independent pieces from a small thread pool
  * lets the next store's tasks back-fill executors the current one
  * isn't using.
  *
  * Safety contract (callers own it): the thunks must be mutually
  * independent — disjoint output dirs, no read of a sibling's store.
  * The counter-log family's batch writes satisfy this by construction
  * (each batch owns its `batch_id=` partition and the merged read is
  * order-independent — the sum-mergeable contract on every store's
  * scaladoc); order-DEPENDENT stores (e.g. the paragraph gate, whose
  * batch k probes batches < k) must keep their waves sequential.
  *
  * Scheduling stays FIFO (the session default): earlier thunks' stages
  * get resources first and later thunks back-fill — exactly the
  * behaviour the guide describes. Failures: every thunk runs to
  * completion or failure, then the FIRST failure rethrows (unwrapped),
  * so a composite fails loudly rather than half-silently.
  */
object Par {
  /** Run one body per wave id concurrently — the composite-row idiom
    * for ORDER-INDEPENDENT store logs (each batch owns its own
    * `batch_id=` partition and the merged read sum/union-merges, so
    * concurrent batch commits are commutative by the store's own
    * contract). Order-DEPENDENT stores (the paragraph gate) must not
    * use this.
    */
  def waves(ids: Seq[Long])(f: Long => Unit): Unit =
    run(ids.map(k => () => f(k)): _*)

  /** Per-pool thread cap (advisor r19): overlap needs 2–3 jobs in
    * flight per the guide, never an unbounded thread count — calls nest
    * (x143 runs Par inside Par), so each pool is bounded and excess
    * thunks queue FIFO, which is exactly the back-fill behaviour wanted.
    */
  private val maxPoolThreads = 8

  def run(thunks: (() => Unit)*): Unit = {
    if (thunks.sizeIs <= 1) { thunks.foreach(_.apply()); return }
    val pool = java.util.concurrent.Executors.newFixedThreadPool(
      math.min(thunks.size, maxPoolThreads))
    try {
      val futs = thunks.map { t =>
        pool.submit(new java.util.concurrent.Callable[Unit] {
          def call(): Unit = t()
        })
      }
      // collect every outcome first (no thunk left running against a
      // store a caller might touch next), then rethrow the first cause
      // with every sibling failure attached as suppressed (advisor r19:
      // concurrent store builds failing together must not lose signal)
      val errs = futs.flatMap { f =>
        try { f.get(); None }
        catch {
          case e: java.util.concurrent.ExecutionException =>
            Some(Option(e.getCause).getOrElse(e))
          case e: Throwable => Some(e)
        }
      }
      errs.headOption.foreach { first =>
        errs.drop(1).foreach(sib => if (sib ne first) first.addSuppressed(sib))
        throw first
      }
    } finally {
      pool.shutdown()
      try {
        pool.awaitTermination(10, java.util.concurrent.TimeUnit.SECONDS)
        ()
      } catch { case _: InterruptedException =>
        Thread.currentThread().interrupt()
      }
    }
  }
}
