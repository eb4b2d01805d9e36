package org.apache.spark.sql

/** Bridge into the `private[sql]` classic.SparkSession constructor — the
  * only way to obtain a session with EXTRA `SparkSessionExtensions` next to
  * an already-running one (extensions are applied at session construction;
  * `newSession()` inherits the parent's extensions object, and
  * `builder.getOrCreate()` returns the existing session unchanged). The
  * shared state (catalog, warehouse) is reused, so tables created in either
  * session are visible to both; runtime SQL confs are copied so plans
  * (shuffle widths, session timezone) match the parent. Same pattern as
  * [[GraftStreamingBridge]] / [[GraftUdafBridge]].
  */
object GraftSessionBridge {

  def withExtensions(base: SparkSession,
                     f: SparkSessionExtensions => Unit): SparkSession = {
    val b = base.asInstanceOf[classic.SparkSession]
    val ext = new SparkSessionExtensions
    f(ext)
    val s = new classic.SparkSession(
      b.sparkContext, Some(b.sharedState), None, ext,
      Map.empty[String, String], Map.empty[String, String])
    // mirror the parent's runtime SQL conf (timezone, shuffle partitions,
    // AQE flags) — a fresh SessionState starts from defaults otherwise
    b.conf.getAll.foreach { case (k, v) =>
      try s.conf.set(k, v) catch { case _: Exception => () } // static confs
    }
    s
  }
}
