package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.{SparkEntry, TestSpark}

/** Properties of the data-prep, retrieval, graph, and foreachBatch
  * operators that the hash oracle can't express: merge-action arithmetic,
  * fill completeness, score-shape invariants, rank-fusion algebra, the
  * PageRank mass bound, and streaming==batch sink equivalence.
  */
class DataPrepRetrievalSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = TestSpark.Sf0001

  test("q_bm25: positive scores, hit counts, descending order, bounded size") {
    val rows = SparkEntry.queries("q_bm25")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(rows.nonEmpty && rows.length <= 20)
    rows.foreach { case (_, hits, score) =>
      assert(hits >= 1, "only matching docs may be scored")
      assert(score > 0.0, "BM25 of a matching doc is strictly positive")
    }
    assert(rows.map(_._3).sliding(2).forall(p => p.length < 2 || p(0) >= p(1)),
      "output must be score-descending")
  }

  test("q_rrf_fusion: ranks bounded by list depth, rrf equals the two-term formula") {
    val rows = SparkEntry.queries("q_rrf_fusion")(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val ra = if (r.isNullAt(1)) None else Some(r.getLong(1))
      val rb = if (r.isNullAt(2)) None else Some(r.getLong(2))
      assert(ra.isDefined || rb.isDefined, "a fused doc must appear in at least one list")
      (ra.toSeq ++ rb.toSeq).foreach(k => assert(k >= 1 && k <= graft.text.RetrievalQueries.TopN))
      val expected = ra.map(k => 1.0 / (60.0 + k)).getOrElse(0.0) +
        rb.map(k => 1.0 / (60.0 + k)).getOrElse(0.0)
      assert(math.abs(r.getDouble(3) - expected) < 1e-8, s"rrf mismatch in $r")
    }
  }

  test("q_merge_upsert: inserts live in the synthetic key range, updates are 1.1x the target price") {
    val orders = graft.core.Tables.orders(spark, dir)
      .select("o_orderkey", "o_totalprice").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val rows = SparkEntry.queries("q_merge_upsert")(spark, dir).collect()
    val byAction = rows.groupBy(_.getString(3))
    assert(byAction.keySet.subsetOf(Set("update", "insert", "keep")))
    assert(byAction("insert").nonEmpty && byAction("update").nonEmpty)
    byAction("insert").foreach { r =>
      assert(r.getLong(0) >= 100000000L, "insert keys are shifted out of the base range")
      assert(r.getString(2) == "N")
    }
    byAction("update").foreach { r =>
      val base = orders(r.getLong(0))
      assert(math.abs(r.getDouble(1) - base * 1.1) <= 0.005 + 1e-9,
        s"update price must be round(1.1x, 2) of the target row")
      assert(r.getString(2) == "U")
    }
    assert(byAction("insert").length == orders.keysIterator.count(_ % 1000 == 0))
  }

  test("q_forward_fill: nulls are exactly the planted ones, and filled carries the last observation") {
    val rows = SparkEntry.queries("q_forward_fill")(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert((r.getLong(0) % 5 == 0) == (r.getLong(2) == 1L), "was_null must match the planted pattern")
    }
    // after the first non-null per user, filled is never null
    val events = graft.core.Tables.events(spark, dir)
      .select(col("event_id"), col("user_id"), col("ts")).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getTimestamp(2))).toMap
    val byUser = rows.groupBy(r => events(r.getLong(0))._1)
    byUser.values.foreach { rs =>
      val ordered = rs.sortBy(r => (events(r.getLong(0))._2.getTime, r.getLong(0)))
      val firstObs = ordered.indexWhere(_.getLong(2) == 0L)
      if (firstObs >= 0)
        ordered.drop(firstObs).foreach(r =>
          assert(!r.isNullAt(3), s"gap after first observation for user ${events(r.getLong(0))._1}"))
    }
  }

  test("q_anomaly_zscore: every flagged row clears the threshold; flags are rare") {
    val n = graft.core.Tables.lineitem(spark, dir).count()
    val rows = SparkEntry.queries("q_anomaly_zscore")(spark, dir).collect()
    rows.foreach(r => assert(math.abs(r.getDouble(4)) > 2.5))
    assert(rows.length < n / 10, "z>2.5 must flag a small tail, not the bulk")
  }

  test("q_mix_report: rates in range, realized ratio consistent with counts") {
    val rows = SparkEntry.queries("q_mix_report")(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (rate, nDocs, nKept, ratio) = (r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4))
      assert(rate >= 20 && rate <= 80)
      assert(nKept <= nDocs)
      assert(math.abs(ratio - nKept.toDouble / nDocs) < 1e-6)
    }
  }

  test("q_pagerank: strictly positive ranks, total mass bounded by 1") {
    val rows = SparkEntry.queries("q_pagerank")(spark, dir).collect()
    assert(rows.nonEmpty)
    val prs = rows.map(_.getDouble(1))
    prs.foreach(p => assert(p > 0.0, "teleport term keeps every node strictly positive"))
    // dangling mass is dropped, so total never exceeds 1 (up to rounding)
    assert(prs.sum <= 1.0 + 1e-3, s"mass ${prs.sum} exceeds 1")
  }

  test("q_incremental_agg: incremental merge equals direct recompute") {
    val inc = SparkEntry.queries("q_incremental_agg")(spark, dir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).sortBy(_._1)
    // same integer-cents arithmetic as the query: exact partial merge is
    // the point, so the recompute must be exact too (a float recompute
    // differs in the last ulp by sum order, which is the bug class the
    // cents spelling removes)
    val full = graft.core.Tables.orders(spark, dir)
      .groupBy("o_orderstatus")
      .agg(count(lit(1)).as("n"),
        (sum(expr("CAST(round(o_totalprice * 100) AS BIGINT)")).cast("double") / 100).as("s"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).sortBy(_._1)
    assert(inc.toSeq == full.toSeq, "IVM must be indistinguishable from recompute")
  }

  test("q_group_sample: at most 5 per group, members really belong to the group") {
    val srcOf = graft.core.Tables.documents(spark, dir)
      .select("doc_id", "source").collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val rows = SparkEntry.queries("q_group_sample")(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getString(0)).foreach { case (src, rs) =>
      assert(rs.length <= 5)
      assert(rs.map(_.getLong(1)).sorted.toSeq == (1L to rs.length).toSeq)
      rs.foreach(r => assert(srcOf(r.getLong(2)) == src))
    }
  }

  test("q_blob_phash: groups have 2+ members, signatures fit in 8 bits and match a driver replay") {
    val rows = SparkEntry.queries("q_blob_phash")(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(0) >= 0 && r.getLong(0) <= 255)
      assert(r.getLong(1) >= 2)
    }
    // driver-side replay of the signature for one canonical doc
    val canonical = rows.head.getLong(2)
    val text = graft.core.Tables.documents(spark, dir)
      .filter(col("doc_id") === canonical).select("text").head().getString(0)
    val bytes = text.getBytes("UTF-8")
    val mean = bytes.map(_ & 0xff).map(_.toLong).sum.toDouble / bytes.length
    val sig = (0 until 8).map { blk =>
      val lo = (blk.toLong * bytes.length / 8).toInt
      val hi = ((blk + 1).toLong * bytes.length / 8).toInt
      val bs = (lo until hi).map(i => (bytes(i) & 0xff).toLong).sum
      if (hi > lo && bs.toDouble / (hi - lo) > mean) 1L << blk else 0L
    }.sum
    assert(sig == rows.head.getLong(0), "engine signature must equal the reference construction")
  }

  test("q_stream_foreachbatch: the merged snapshot equals the batch aggregate") {
    val streamed = SparkEntry.queries("q_stream_foreachbatch")(spark, dir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).sortBy(_._1)
    val batch = graft.core.Tables.events(spark, dir)
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"), round(sum("value"), 6).as("sum_v"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).sortBy(_._1)
    assert(streamed.map(t => (t._1, t._2)).toSeq == batch.map(t => (t._1, t._2)).toSeq)
    streamed.zip(batch).foreach { case (s0, b0) =>
      assert(math.abs(s0._3 - b0._3) < 1e-5, s"sum_v diverged for ${s0._1}")
    }
  }

  test("q_grid_search: the (1.2, 0.75) cell reproduces q_ndcg_eval exactly") {
    val rows = SparkEntry.queries("q_grid_search")(spark, dir).collect()
    assert(rows.length == 4)
    assert(rows.count(_.getAs[Long]("is_best") == 1L) == 1)
    rows.foreach { r =>
      val nd = r.getAs[Double]("ndcg")
      assert(nd > 0.0 && nd <= 1.0, s"ndcg $nd out of (0,1]")
      assert(r.getAs[Long]("n_ranked") <= 10L)
    }
    // cross-operator consistency: the default-config cell must equal the
    // standalone nDCG eval (same K1=1.2, B=0.75, same rounding)
    val cell = rows.find(r => r.getAs[Long]("k1_x100") == 120L &&
      r.getAs[Long]("b_x100") == 75L).get
    val standalone = SparkEntry.queries("q_ndcg_eval")(spark, dir)
      .collect().head.getAs[Double]("ndcg")
    assert(cell.getAs[Double]("ndcg") == standalone,
      s"grid cell ${cell.getAs[Double]("ndcg")} != q_ndcg_eval $standalone")
  }
}
