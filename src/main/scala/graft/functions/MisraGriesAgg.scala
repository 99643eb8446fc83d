package graft.functions

import org.apache.spark.sql.{Column, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions

/** Misra–Gries heavy-hitter sketch as a mergeable Spark `Aggregator`: a
  * bounded map of at most `k` candidate counters. The classic guarantee —
  * every item with true frequency > n/(k+1) survives in the final map —
  * makes the sketch a CANDIDATE generator: a second exact recount over the
  * (tiny, broadcast) candidate set turns it into exact heavy hitters
  * without ever running a full-vocabulary groupBy.
  *
  * Scale notes: map-side partial aggregation means each input partition
  * builds its own k-entry sketch and only the k-entry maps shuffle — the
  * 100 TB shape for "top words in the corpus" where a full word groupBy
  * would shuffle the whole tokenized corpus. `merge` is the standard
  * mergeable-summaries combine (add counts, subtract the (k+1)-th largest,
  * drop non-positive), which preserves the error bound (Agarwal et al.,
  * "Mergeable Summaries", PODS'12).
  */
class MisraGriesAgg(k: Int) extends Aggregator[String, Map[String, Long], Map[String, Long]] {

  override def zero: Map[String, Long] = Map.empty

  override def reduce(b: Map[String, Long], w: String): Map[String, Long] =
    b.get(w) match {
      case Some(c)            => b.updated(w, c + 1L)
      case None if b.size < k => b.updated(w, 1L)
      case None => // decrement-all step: one shared unit comes off every counter
        b.iterator.map { case (kw, c) => (kw, c - 1L) }.filter(_._2 > 0L).toMap
    }

  override def merge(a: Map[String, Long], b: Map[String, Long]): Map[String, Long] = {
    if (a.isEmpty) b
    else if (b.isEmpty) a
    else {
      val m = (a.keySet ++ b.keySet).iterator
        .map(w => w -> (a.getOrElse(w, 0L) + b.getOrElse(w, 0L))).toMap
      if (m.size <= k) m
      else {
        val cut = m.values.toIndexedSeq.sorted(Ordering[Long].reverse)(k)
        m.iterator.map { case (w, c) => (w, c - cut) }.filter(_._2 > 0L).toMap
      }
    }
  }

  override def finish(b: Map[String, Long]): Map[String, Long] = b

  override def bufferEncoder: Encoder[Map[String, Long]] =
    ExpressionEncoder[Map[String, Long]]()
  override def outputEncoder: Encoder[Map[String, Long]] =
    ExpressionEncoder[Map[String, Long]]()
}

object MisraGriesAgg {
  /** Sketch capacity used by `q_heavy_hitters` — 64 counters upper-bounds
    * a threshold of n/30 with room to spare (64 ≥ 30 ⇒ superset holds).
    */
  val K = 64

  lazy val asUdaf: org.apache.spark.sql.expressions.UserDefinedFunction =
    functions.udaf(new MisraGriesAgg(K))
  def apply(c: Column): Column = asUdaf(c)
}
