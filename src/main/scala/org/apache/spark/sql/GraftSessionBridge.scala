package org.apache.spark.sql

/** Session/plan bridges for the SQL DML surface. Extensions (parser
  * injection) are applied at session CONSTRUCTION: `newSession()` inherits
  * the parent's extensions object and `builder.getOrCreate()` returns the
  * already-active session unchanged — so obtaining an extension-bearing
  * session next to a running one needs the builder with the active/default
  * session temporarily cleared. Deployments skip all of this with
  * `--conf spark.sql.extensions=graft.GraftExtensions` (every session gets
  * the parser at birth); the bridge exists for tests and programmatic use
  * on an already-built session. Same pattern family as
  * [[GraftStreamingBridge]] / [[GraftUdafBridge]].
  */
object GraftSessionBridge {

  def withExtensions(base: SparkSession,
                     f: SparkSessionExtensions => Unit): SparkSession =
    synchronized {
      val b = base.asInstanceOf[classic.SparkSession]
      val prevDefault = classic.SparkSession.getDefaultSession
      val prevActive = classic.SparkSession.getActiveSession
      classic.SparkSession.clearDefaultSession()
      classic.SparkSession.clearActiveSession()
      val s =
        try classic.SparkSession.builder().withExtensions(f).getOrCreate()
        finally {
          prevDefault.foreach(classic.SparkSession.setDefaultSession)
          prevActive.foreach(classic.SparkSession.setActiveSession)
        }
      // mirror the parent's runtime SQL conf (timezone, shuffle widths,
      // AQE flags) — the fresh SessionState starts from defaults otherwise.
      // NOTE: the new session has its own SharedState/catalog; create the
      // tables the DML statements target from THIS session.
      b.conf.getAll.foreach { case (k, v) =>
        try s.conf.set(k, v) catch { case _: Exception => () } // static confs
      }
      s
    }

  /** `private[sql] Dataset.ofRows` — analyze + wrap an arbitrary logical
    * plan (the SQL DML commands hand their parsed source subtree here). */
  def ofRows(spark: SparkSession,
             plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)

  /** Wrap a catalyst Expression (possibly unresolved — DataFrame ops
    * resolve it against their children) as a user-level Column. */
  def column(e: org.apache.spark.sql.catalyst.expressions.Expression): Column =
    classic.ExpressionUtils.column(e)
}
