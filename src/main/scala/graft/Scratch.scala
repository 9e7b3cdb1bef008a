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
