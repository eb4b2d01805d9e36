package graft.ops

/** Run independent Spark actions as one concurrent wave (guide §2.6
  * "overlap independent jobs"): actions over ALREADY-MATERIALIZED inputs
  * that write DISJOINT targets pay one job+commit floor instead of N.
  * Failures propagate: the first throwable re-throws after every thread
  * joins (no half-abandoned writers). Spark's scheduler is thread-safe;
  * job groups/descriptions are thread-local, so each action labels its own
  * jobs. The caller owns the ordering contract — only truly independent
  * writes belong in one wave (the IncrementalClustering / Medallion /
  * IncrementalCuration idiom, shared).
  */
object JobWave {
  def run(bodies: Seq[() => Unit]): Unit = {
    if (bodies.sizeIs <= 1) { bodies.foreach(_.apply()); return }
    val failure = new java.util.concurrent.atomic.AtomicReference[Throwable]()
    val threads = bodies.map(b => new Thread(() =>
      try b() catch { case t: Throwable => failure.compareAndSet(null, t) }))
    threads.foreach(_.start())
    threads.foreach(_.join())
    if (failure.get() != null) throw failure.get()
  }
}
