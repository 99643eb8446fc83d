package graft.functions

import org.apache.spark.sql.expressions.Aggregator

/** Distributed bounded bottom-k DISTINCT aggregate — the KMV/theta-sketch
  * build kernel (SURVEY.md §2.3 sketch family), and the inverse of
  * [[TopKAgg]]: the buffer holds at most k distinct longs sorted
  * ascending, so partial aggregation trims map-side and the shuffle
  * carries ≤ k values per (group, partition) instead of the group's whole
  * distinct hash domain. This is what lets a k-minimum-values sketch build
  * run at 100 TB: the previous form (`row_number() over (partitionBy grp
  * orderBy h)` on the full deduped frame) sorted each group's ENTIRE
  * distinct-value set in one reducer task.
  *
  * Dedup is part of the contract (KMV keeps the k smallest DISTINCT
  * hashes), so callers must NOT pre-`.distinct()` — the aggregator absorbs
  * duplicates map-side for free.
  */
class BottomKDistinctAgg(k: Int) extends Aggregator[Long, Seq[Long], Seq[Long]] {
  override def zero: Seq[Long] = Seq.empty
  override def reduce(b: Seq[Long], a: Long): Seq[Long] =
    // full buffer and a ≥ current kth-min: a can never enter the sketch
    if (b.length == k && a >= b.last) b
    else if (b.contains(a)) b
    else ((b :+ a).sorted).take(k)
  override def merge(b1: Seq[Long], b2: Seq[Long]): Seq[Long] =
    (b1 ++ b2).distinct.sorted.take(k)
  override def finish(r: Seq[Long]): Seq[Long] = r
  override def bufferEncoder: org.apache.spark.sql.Encoder[Seq[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()
  override def outputEncoder: org.apache.spark.sql.Encoder[Seq[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()
}
