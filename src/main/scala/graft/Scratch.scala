package graft

import org.apache.spark.sql.Dataset

/** Session-scoped registry for per-query cached intermediates.
  *
  * Several queries materialize mid-plan results (MinHash signatures,
  * n-gram token tables, merged-contact outputs) that must live for the
  * duration of ONE query's action(s) but would otherwise stay pinned in
  * the block manager for the rest of the session — a 60-query
  * Verify/Bench session would accumulate gigabytes of dead cache and
  * push the driver into full GCs (ADVICE r01). Queries wrap such
  * intermediates in [[scoped]]; the harness (Bench/Verify, tests) calls
  * [[releaseAll]] after each query's terminal action.
  */
object Scratch {
  private val live = new java.util.concurrent.ConcurrentLinkedQueue[Dataset[_]]()

  /** Persist `ds` (compressed columnar cache) and register it for
    * release after the current query completes. */
  def scoped[T](ds: Dataset[T]): Dataset[T] = {
    val p = ds.persist()
    live.add(p)
    p
  }

  /** [[scoped]] plus a PLAN FENCE: returns a fresh DataFrame whose
    * logical plan is a single RDD leaf over the cached result.
    * Caching truncates EXECUTION but not ANALYSIS — an operator that
    * issues many actions over a deep pipeline (the iterative
    * connected-components machinery, multi-pass merges) re-analyzes
    * the full upstream plan on every action, pure driver-side cost
    * that grows with pipeline depth. Measured on q124's merge stage:
    * ~12 s of planning over EMPTY cached relations at sf0.1, ~3 s
    * fenced. The RDD executes the cached query, so each downstream
    * action pays one cache read and a leaf-sized plan. Row-encoder
    * round-trip applies — use only where the relation is modest
    * (assignments, pair lists, bucket tables), not on corpus-wide hot
    * paths. */
  def fenced(df: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val cached = scoped(df)
    cached.sparkSession.createDataFrame(cached.rdd, cached.schema)
  }

  /** Unpersist every scoped intermediate registered since the last
    * call. Non-blocking: block eviction proceeds asynchronously. */
  def releaseAll(): Unit = {
    var d = live.poll()
    while (d != null) {
      try d.unpersist(blocking = false) catch { case _: Throwable => () }
      d = live.poll()
    }
  }
}
