package graft.functions

import org.apache.spark.sql.expressions.Aggregator

/** A scored neighbor candidate: (id, similarity). */
case class ScoredId(id: Long, sim: Double)

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
/** A distinctive-term candidate: (z-score, raw count, term). */
case class ScoredTerm(z: Double, y: Long, term: String)

/** Bounded per-group top-k over (z desc, y desc, term asc) — the
  * [[TopKAgg]] shape specialized to the distinctive-term ranking
  * (q_log_odds): only k rows per (group, partition) cross the shuffle,
  * where a per-group rank window would sort each group's whole
  * vocabulary in a single reducer task.
  */
class TopKTermAgg(k: Int) extends Aggregator[ScoredTerm, Seq[ScoredTerm], Seq[ScoredTerm]] {
  private def trim(s: Seq[ScoredTerm]): Seq[ScoredTerm] =
    s.sortBy(x => (-x.z, -x.y, x.term)).take(k)
  override def zero: Seq[ScoredTerm] = Seq.empty
  override def reduce(b: Seq[ScoredTerm], a: ScoredTerm): Seq[ScoredTerm] = trim(b :+ a)
  override def merge(b1: Seq[ScoredTerm], b2: Seq[ScoredTerm]): Seq[ScoredTerm] = trim(b1 ++ b2)
  override def finish(r: Seq[ScoredTerm]): Seq[ScoredTerm] = r
  override def bufferEncoder: org.apache.spark.sql.Encoder[Seq[ScoredTerm]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[ScoredTerm]]()
  override def outputEncoder: org.apache.spark.sql.Encoder[Seq[ScoredTerm]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[ScoredTerm]]()
}

class TopKAgg(k: Int) extends Aggregator[ScoredId, Seq[ScoredId], Seq[ScoredId]] {
  private def trim(s: Seq[ScoredId]): Seq[ScoredId] =
    s.sortBy(x => (-x.sim, x.id)).take(k)
  override def zero: Seq[ScoredId] = Seq.empty
  override def reduce(b: Seq[ScoredId], a: ScoredId): Seq[ScoredId] = trim(b :+ a)
  override def merge(b1: Seq[ScoredId], b2: Seq[ScoredId]): Seq[ScoredId] = trim(b1 ++ b2)
  override def finish(r: Seq[ScoredId]): Seq[ScoredId] = r
  override def bufferEncoder: org.apache.spark.sql.Encoder[Seq[ScoredId]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[ScoredId]]()
  override def outputEncoder: org.apache.spark.sql.Encoder[Seq[ScoredId]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[ScoredId]]()
}
