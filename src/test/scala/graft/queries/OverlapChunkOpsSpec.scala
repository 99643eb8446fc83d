package graft.queries

import org.apache.spark.sql.Row
import org.scalatest.funsuite.AnyFunSuite

import graft.{SparkEntry, TestSpark}

/** Semantic invariants of q_audience_overlap, q_bitmap_distinct,
  * q_dedup_cdc, q_autocorr, q_weighted_quantile, q_blob_dedup,
  * q_stream_topn and q_session_metrics.
  */
class OverlapChunkOpsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private def run(name: String): Array[Row] =
    SparkEntry.queries(name)(spark, TestSpark.Sf0001).collect()

  test("q_audience_overlap: intersections bounded, Jaccard well-formed") {
    val rows = run("q_audience_overlap")
    assert(rows.length === 10, "C(5,2) type pairs")
    rows.foreach { r =>
      val (na, nb, both) = (r.getAs[Long]("n_a"), r.getAs[Long]("n_b"),
        r.getAs[Long]("n_both"))
      assert(both <= math.min(na, nb))
      val j = r.getAs[Long]("jaccard_ppm")
      assert(j >= 0L && j <= 1000000L)
      assert(j === both * 1000000L / (na + nb - both))
    }
  }

  test("q_bitmap_distinct: the bitmap count is EXACT for every type") {
    val rows = run("q_bitmap_distinct")
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("bitmap_ok") === 1L,
        s"${r.getAs[String]("event_type")}: bitmap ${r.getAs[Long]("n_bitmap")} " +
          s"!= exact ${r.getAs[Long]("n_exact")}")
      // word count bounded by the id-domain bound, not event volume
      assert(r.getAs[Long]("n_words") <= r.getAs[Long]("n_exact"))
    }
  }

  test("q_dedup_cdc: duplicate chunks exist and every row is a real collision") {
    val rows = run("q_dedup_cdc")
    assert(rows.nonEmpty, "the synthetic corpus repeats passages — CDC must see them")
    rows.foreach(r => assert(r.getAs[Long]("n_occurrences") >= 2L))
  }

  test("q_autocorr: correlation coefficients bounded, pair counts shrink with lag") {
    val rows = run("q_autocorr").sortBy(_.getAs[Long]("lag"))
    assert(rows.map(_.getAs[Long]("lag")).toSeq === Seq(1L, 24L, 168L))
    rows.foreach { r =>
      val a = r.getAs[Double]("acf")
      assert(a >= -1.0 - 1e-9 && a <= 1.0 + 1e-9)
    }
    val pairs = rows.map(_.getAs[Long]("n_pairs"))
    assert(pairs.zip(pairs.tail).forall { case (a, b) => a >= b },
      "longer lags can only lose overlap")
  }

  test("q_weighted_quantile: quartile order holds and weighting is active") {
    val r = run("q_weighted_quantile").head
    val (p25, p50, p75) = (r.getAs[Double]("w_p25"), r.getAs[Double]("w_p50"),
      r.getAs[Double]("w_p75"))
    assert(p25 <= p50 && p50 <= p75)
    assert(r.getAs[Long]("total_weight") >
      graft.core.Tables.lineitem(spark, TestSpark.Sf0001).count(),
      "total weight must exceed the row count (quantities > 1 exist)")
  }

  test("q_blob_dedup: exact pairs are a subset of candidate pairs") {
    val r = run("q_blob_dedup").head
    assert(r.getAs[Long]("exact_pairs") <= r.getAs[Long]("cand_pairs"))
    assert(r.getAs[Long]("precision_ppm") <= 1000000L)
  }

  test("q_stream_topn: at most 3 ranks per window, counts non-increasing in rank") {
    val byWindow = run("q_stream_topn").groupBy(_.getAs[java.sql.Timestamp]("w_start"))
    byWindow.values.foreach { rows =>
      val sorted = rows.sortBy(_.getAs[Long]("rk"))
      assert(sorted.length <= 3)
      assert(sorted.map(_.getAs[Long]("rk")).toSeq === (1L to sorted.length))
      val ns = sorted.map(_.getAs[Long]("n"))
      assert(ns.zip(ns.tail).forall { case (a, b) => a >= b })
    }
  }

  test("q_session_metrics: depth histogram reassembles the session count") {
    val rows = run("q_session_metrics")
    val total = rows.head.getAs[Long]("n_sessions")
    assert(rows.map(_.getAs[Long]("n_sessions_at_depth")).sum === total)
    val bounces = rows.find(_.getAs[Long]("depth") == 1L)
      .map(_.getAs[Long]("n_sessions_at_depth")).getOrElse(0L)
    assert(rows.head.getAs[Long]("bounce_ppm") === bounces * 1000000L / total)
  }
}
