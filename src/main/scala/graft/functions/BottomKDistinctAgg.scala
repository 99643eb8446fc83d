package graft.functions

import scala.collection.immutable.ArraySeq

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
  *
  * The buffer is an ArraySeq over a sorted primitive Array[Long], because
  * `reduce` runs once PER INPUT ROW: the steady-state path (buffer full,
  * a ≥ kth-min — almost every row once the sketch warms) must be O(1), and
  * the rare insert is a binary search + one arraycopy. The previous
  * List-backed buffer paid O(k) `.last`/`.length` on EVERY row — ~100x the
  * per-row work at k = 128, measured as the dominant cost of
  * q_join_discovery's column sweep.
  */
class BottomKDistinctAgg(k: Int) extends Aggregator[Long, Seq[Long], Seq[Long]] {
  override def zero: Seq[Long] = ArraySeq.unsafeWrapArray(Array.emptyLongArray)

  private def backing(b: Seq[Long]): Array[Long] = b match {
    case as: ArraySeq[_] if as.unsafeArray.isInstanceOf[Array[Long]] =>
      as.unsafeArray.asInstanceOf[Array[Long]]
    case _ => b.toArray
  }

  override def reduce(b: Seq[Long], a: Long): Seq[Long] = {
    val arr = backing(b)
    val n = arr.length
    // full buffer and a ≥ current kth-min: a can never enter the sketch
    if (n == k && a >= arr(n - 1)) return b
    val idx = java.util.Arrays.binarySearch(arr, a)
    if (idx >= 0) return b // already in the sketch (distinct contract)
    val ins = -(idx + 1) // insertion point; < k whenever we get here full
    val m = math.min(n + 1, k)
    val out = new Array[Long](m)
    System.arraycopy(arr, 0, out, 0, ins)
    out(ins) = a
    System.arraycopy(arr, ins, out, ins + 1, m - ins - 1)
    ArraySeq.unsafeWrapArray(out)
  }

  override def merge(b1: Seq[Long], b2: Seq[Long]): Seq[Long] =
    ArraySeq.unsafeWrapArray(
      (backing(b1) ++ backing(b2)).distinct.sorted.take(k))

  override def finish(r: Seq[Long]): Seq[Long] = r
  override def bufferEncoder: org.apache.spark.sql.Encoder[Seq[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()
  override def outputEncoder: org.apache.spark.sql.Encoder[Seq[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()
}
