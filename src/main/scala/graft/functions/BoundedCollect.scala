package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Size-bounded id collector backing the LSH band-bucket frequency cap
  * (q88 — the skew guard for near-dup dedup at corpus scale; same
  * scale answer as the contact pipeline's stop-key cap, reference
  * blocking loop combine_contacts.py:1116-1131).
  *
  * Collects a group's ids but never holds more than cap+1 of them:
  * once a partial buffer passes the cap the bucket is already doomed,
  * so further inputs are dropped and merges truncate. A hot bucket —
  * exactly the case the cap exists for — therefore costs O(cap)
  * aggregation-buffer memory and O(cap) shuffle bytes per map
  * partition instead of O(bucket size). That map-side truncation is
  * what makes the cap a scale guard rather than a post-hoc filter on
  * a fully materialized bucket.
  *
  * finish() emits the SORTED ids for in-cap buckets and an empty
  * array for over-cap ones; callers filter `size(ids) >= 2`, which
  * drops both the empties and the pairless singletons in one gate.
  *
  * Exactness relies on group inputs being DISTINCT — guaranteed
  * upstream: the banded relation has one row per (doc, band) and the
  * group key is (band, key) — so concatenation without dedupe cannot
  * double-count toward the cap.
  */
final class BoundedIdBag(cap: Int) extends Aggregator[Long, Array[Long], Array[Long]] {
  // cap < Int.MaxValue: keep = cap + 1 must not overflow — a wrapped
  // keep would make every bucket read as doomed and silently drop all
  // pairs. A cap that large is meaningless anyway (it means "uncapped").
  require(cap >= 1 && cap < Int.MaxValue,
    s"bucket cap must be in [1, ${Int.MaxValue - 1}], got $cap")
  private val keep = cap + 1

  override def zero: Array[Long] = Array.emptyLongArray

  override def reduce(b: Array[Long], a: Long): Array[Long] =
    if (b.length >= keep) b
    else { val r = java.util.Arrays.copyOf(b, b.length + 1); r(b.length) = a; r }

  override def merge(x: Array[Long], y: Array[Long]): Array[Long] =
    if (x.length >= keep) x
    else if (y.length >= keep) y
    else {
      val n = math.min(keep, x.length + y.length)
      val r = java.util.Arrays.copyOf(x, n)
      System.arraycopy(y, 0, r, x.length, n - x.length)
      r
    }

  override def finish(r: Array[Long]): Array[Long] =
    if (r.length > cap) Array.emptyLongArray
    else { val s = r.clone(); java.util.Arrays.sort(s); s }

  override def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoder()
  override def outputEncoder: Encoder[Array[Long]] = ExpressionEncoder()
}

object BoundedCollect {
  /** Column function: collect the group's (distinct-by-construction)
    * ids, sorted, or an empty array if the group exceeds `cap`. */
  def boundedIdBag(cap: Int): org.apache.spark.sql.expressions.UserDefinedFunction =
    org.apache.spark.sql.functions.udaf(new BoundedIdBag(cap))
}
