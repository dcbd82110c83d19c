package graft.tools

/** Wall-clock accumulator for the one-time memoized artifact builds (the
  * d03 pair/components frame, the IVF/MIPS/MinHash indexes). The builds run
  * during the bench's untimed warm-up pass — deliberately, since a
  * long-lived cluster builds each index once and probes it many times — but
  * excluding them SILENTLY would let a methodology change read as an engine
  * win, so [[graft.Bench]] reports the accumulated total as the
  * `warmup_build` key beside the per-query medians.
  *
  * Eagerness caveat: each memoized builder wraps only its EAGER work
  * (KMeans fit, checkpoint materialization, collect-based scalars); a
  * builder's lazily-cached frames fill on their first downstream action,
  * which lands inside the warm-up run of the first probing query and is
  * excluded from the timed medians either way.
  */
object BuildTimer {
  private val acc = new java.util.concurrent.atomic.AtomicLong(0L)

  def time[T](f: => T): T = {
    val t0 = System.nanoTime()
    try f finally { acc.addAndGet(System.nanoTime() - t0); () }
  }

  def totalSeconds: Double = acc.get() / 1e9

  def reset(): Unit = acc.set(0L)
}
