package graft.functions

import org.apache.spark.sql.expressions.Aggregator

/** A scored neighbor candidate: (id, similarity). */
case class ScoredId(id: Long, sim: Double)

/** Shared bounded top-k kernel for the scored aggregators below: the
  * buffer is kept SORTED under `ord`, so `reduce` (which runs once per
  * input row) is O(1) on the steady-state path — buffer full and the
  * candidate at/below the kth — and a binary-search splice on the rare
  * improvement. The previous form re-sorted the whole buffer per row
  * (O(k log k) every input), which dominated the aggregate's cost at
  * k = 10..128. Tie behavior matches the old stable `sortBy(b :+ a)`:
  * a candidate equal to an incumbent inserts AFTER it, so incumbents
  * survive boundary ties.
  */
private[functions] object BoundedTopK {
  def reduce[T](b: Seq[T], a: T, k: Int, ord: Ordering[T]): Seq[T] = {
    val n = b.length
    if (n == k && ord.gteq(a, b(n - 1))) return b // at/below the kth: out
    var lo = 0
    var hi = n
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (ord.lteq(b(mid), a)) lo = mid + 1 else hi = mid
    }
    val (pre, post) = b.splitAt(lo)
    ((pre :+ a) ++ post).take(k)
  }
  def merge[T](b1: Seq[T], b2: Seq[T], k: Int, ord: Ordering[T]): Seq[T] =
    (b1 ++ b2).sorted(ord).take(k)
}

/** A distinctive-term candidate: (z-score, raw count, term). */
case class ScoredTerm(z: Double, y: Long, term: String)

/** Bounded per-group top-k over (z desc, y desc, term asc) — the
  * [[TopKAgg]] shape specialized to the distinctive-term ranking
  * (q_log_odds): only k rows per (group, partition) cross the shuffle,
  * where a per-group rank window would sort each group's whole
  * vocabulary in a single reducer task.
  */
class TopKTermAgg(k: Int) extends Aggregator[ScoredTerm, Seq[ScoredTerm], Seq[ScoredTerm]] {
  private val ord: Ordering[ScoredTerm] =
    Ordering.by((x: ScoredTerm) => (-x.z, -x.y, x.term))
  override def zero: Seq[ScoredTerm] = Vector.empty
  override def reduce(b: Seq[ScoredTerm], a: ScoredTerm): Seq[ScoredTerm] =
    BoundedTopK.reduce(b, a, k, ord)
  override def merge(b1: Seq[ScoredTerm], b2: Seq[ScoredTerm]): Seq[ScoredTerm] =
    BoundedTopK.merge(b1, b2, k, ord)
  override def finish(r: Seq[ScoredTerm]): Seq[ScoredTerm] = r
  override def bufferEncoder: org.apache.spark.sql.Encoder[Seq[ScoredTerm]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[ScoredTerm]]()
  override def outputEncoder: org.apache.spark.sql.Encoder[Seq[ScoredTerm]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[ScoredTerm]]()
}

/** Distributed bounded top-k aggregate (the kNN-join reduce kernel,
  * SURVEY.md §2.10 family): the buffer holds at most k (sim, id) pairs, so
  * partial aggregation trims map-side and the shuffle carries k rows per
  * (group, partition) instead of the whole group — the property that makes
  * a top-k similarity join run at 100 TB where a window over the full
  * group would sort N rows per query.
  *
  * Ordering: sim descending, id ascending — deterministic ties, matching
  * the oracle's `ORDER BY sim DESC, n_id` window rank.
  */
class TopKAgg(k: Int) extends Aggregator[ScoredId, Seq[ScoredId], Seq[ScoredId]] {
  private val ord: Ordering[ScoredId] =
    Ordering.by((x: ScoredId) => (-x.sim, x.id))
  override def zero: Seq[ScoredId] = Vector.empty
  override def reduce(b: Seq[ScoredId], a: ScoredId): Seq[ScoredId] =
    BoundedTopK.reduce(b, a, k, ord)
  override def merge(b1: Seq[ScoredId], b2: Seq[ScoredId]): Seq[ScoredId] =
    BoundedTopK.merge(b1, b2, k, ord)
  override def finish(r: Seq[ScoredId]): Seq[ScoredId] = r
  override def bufferEncoder: org.apache.spark.sql.Encoder[Seq[ScoredId]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[ScoredId]]()
  override def outputEncoder: org.apache.spark.sql.Encoder[Seq[ScoredId]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[ScoredId]]()
}
