package graft.kmeans

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions

/** Running (elementwise sum, count) buffer for a vector mean. */
case class VecMeanBuf(sum: Array[Double], n: Long)

/** Per-group N-dimensional vector mean as a real distributive aggregate:
  * partial elementwise sums on the map side, zip-add on merge, divide at
  * finish. This is what the reference computes single-threaded per group
  * (/root/reference/reducer.py:19-30) — but as an `Aggregator` it shuffles
  * exactly K buffers of D doubles instead of the posexplode plan's D rows
  * per point, which is the difference between an O(K·D) and an O(N·D)
  * shuffle at 100 TB (SURVEY.md §2.10).
  */
object VecMeanAgg extends Aggregator[Seq[Double], VecMeanBuf, Seq[Double]] {

  override def zero: VecMeanBuf = VecMeanBuf(Array.emptyDoubleArray, 0L)

  override def reduce(b: VecMeanBuf, v: Seq[Double]): VecMeanBuf = {
    if (b.n == 0L) VecMeanBuf(v.toArray, 1L)
    else {
      val s = b.sum
      var i = 0
      while (i < s.length) { s(i) += v(i); i += 1 }
      VecMeanBuf(s, b.n + 1)
    }
  }

  override def merge(a: VecMeanBuf, b: VecMeanBuf): VecMeanBuf = {
    if (a.n == 0L) b
    else if (b.n == 0L) a
    else {
      val s = a.sum
      var i = 0
      while (i < s.length) { s(i) += b.sum(i); i += 1 }
      VecMeanBuf(s, a.n + b.n)
    }
  }

  override def finish(b: VecMeanBuf): Seq[Double] =
    if (b.n == 0L) Seq.empty else b.sum.map(_ / b.n).toSeq

  override def bufferEncoder: Encoder[VecMeanBuf] = Encoders.product[VecMeanBuf]
  override def outputEncoder: Encoder[Seq[Double]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Double]]()

  /** Untyped Column form for use in `groupBy(...).agg(...)`. */
  lazy val asUdaf = functions.udaf(VecMeanAgg)
  def apply(c: Column): Column = asUdaf(c)
}
