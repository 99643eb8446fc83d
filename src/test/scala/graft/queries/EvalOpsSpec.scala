package graft.queries

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{SparkEntry, TestSpark}

/** Semantic invariants of the eval/attribution operators (q_ndcg_eval,
  * q_ab_ttest, q_seasonal_profile, q_lexical_diversity, q_stream_distinct,
  * q_graph_bfs, q_attribution).
  */
class EvalOpsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private def run(name: String): Array[Row] =
    SparkEntry.queries(name)(spark, TestSpark.Sf0001).collect()

  test("q_ndcg_eval: DCG bounded by IDCG, nDCG in (0, 1]") {
    val r = run("q_ndcg_eval").head
    val (dcg, idcg, ndcg) = (r.getAs[Double]("dcg"), r.getAs[Double]("idcg"),
      r.getAs[Double]("ndcg"))
    assert(r.getAs[Long]("n_ranked") >= 1L && r.getAs[Long]("n_ranked") <= 10L)
    // the ideal ordering is by definition at least as good as any ranking
    assert(dcg <= idcg + 1e-9)
    assert(ndcg > 0.0 && ndcg <= 1.0 + 1e-9)
    assert(math.abs(ndcg - dcg / idcg) < 1e-5)
  }

  test("q_ab_ttest: Welch dof between the per-arm floor and the pooled ceiling") {
    val r = run("q_ab_ttest").head
    val (na, nb) = (r.getAs[Long]("n_a"), r.getAs[Long]("n_b"))
    val dof = r.getAs[Double]("dof")
    assert(na > 0 && nb > 0)
    // Welch-Satterthwaite dof is sandwiched by min(n)-1 and n_a+n_b-2
    assert(dof >= math.min(na, nb) - 1.0 && dof <= (na + nb - 2).toDouble,
      s"dof $dof outside [${math.min(na, nb) - 1}, ${na + nb - 2}]")
    val direct = graft.core.Tables.events(spark, TestSpark.Sf0001)
      .filter(col("event_type") === "purchase").agg(avg("value")).head.getDouble(0)
    assert(math.abs(r.getAs[Double]("mean_a") - direct) < 1e-4)
  }

  test("q_seasonal_profile: grid mass conserved, peak cell dominates the uniform share") {
    val rows = run("q_seasonal_profile")
    val total = graft.core.Tables.events(spark, TestSpark.Sf0001).count()
    assert(rows.map(_.getAs[Long]("n_total")).sum === total)
    rows.foreach { r =>
      assert(r.getAs[Long]("peak_dow") >= 0 && r.getAs[Long]("peak_dow") <= 6)
      assert(r.getAs[Long]("peak_hr") >= 0 && r.getAs[Long]("peak_hr") <= 23)
      // the max cell can never fall below the uniform 1/168 share
      assert(r.getAs[Long]("peak_share_ppm") >= 1000000L / 168L)
      assert(r.getAs[Long]("peak_n") <= r.getAs[Long]("n_total"))
    }
  }

  test("q_lexical_diversity: information-theoretic bounds hold per source") {
    run("q_lexical_diversity").foreach { r =>
      val (v, n) = (r.getAs[Long]("vocab"), r.getAs[Long]("n_tokens"))
      assert(v <= n && r.getAs[Long]("n_hapax") <= v)
      val simpson = r.getAs[Double]("simpson")
      assert(simpson >= 0.0 && simpson <= 1.0)
      val h = r.getAs[Double]("entropy")
      // uniform distribution maximizes entropy at ln(vocab)
      assert(h >= 0.0 && h <= math.log(v.toDouble) + 1e-9)
      assert(r.getAs[Double]("eff_vocab") <= v.toDouble + 1e-6)
    }
  }

  test("q_stream_distinct: per-window estimates positive, fleet-mean inside the LC band") {
    val rows = run("q_stream_distinct")
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_exact") >= 1L)
      assert(r.getAs[Double]("est") > 0.0)
    }
    // a single 2-user window can collide into one register (ratio ~50%),
    // but the MEAN ratio across hundreds of windows must sit near 100
    val mean = rows.map(_.getAs[Double]("est_vs_exact_x100")).sum / rows.length
    assert(mean > 70.0 && mean < 140.0, s"fleet mean ratio $mean out of band")
  }

  test("q_graph_bfs: hop census starts at the seed and stays within the cap") {
    val rows = run("q_graph_bfs").sortBy(_.getAs[Int]("hop"))
    assert(rows.head.getAs[Int]("hop") === 0)
    assert(rows.head.getAs[Long]("n_nodes") === 1L, "hop 0 is the seed alone")
    assert(rows.forall(_.getAs[Int]("hop") <= 2), "hop cap breached")
    val vocab = graft.core.Tables.documents(spark, TestSpark.Sf0001)
      .select(explode(split(col("text"), " ")).as("w"))
      .select(countDistinct("w")).head.getLong(0)
    assert(rows.map(_.getAs[Long]("n_nodes")).sum <= vocab)
  }

  test("q_attribution: window attribution implies history attribution") {
    val r = run("q_attribution").head
    val n = r.getAs[Long]("n_purchases")
    val last = r.getAs[Long]("last_touch_attributed")
    val first = r.getAs[Long]("first_touch_1h_attributed")
    assert(last <= n && first <= n)
    // a click within the trailing hour IS a click somewhere in history
    assert(first <= last)
    assert(r.getAs[Double]("avg_gap_s") > 0.0)
  }

  test("q_calibration_bins: ECE is the holdout-weighted mean gap; rates bounded") {
    val rows = run("q_calibration_bins")
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("pred_ppm") >= 0 && r.getAs[Long]("pred_ppm") <= 1000000)
      assert(r.getAs[Long]("obs_ppm") >= 0 && r.getAs[Long]("obs_ppm") <= 1000000)
      assert(r.getAs[Long]("gap_ppm") ==
        math.abs(r.getAs[Long]("obs_ppm") - r.getAs[Long]("pred_ppm")))
    }
    val ece = rows.head.getAs[Long]("ece_ppm")
    assert(rows.forall(_.getAs[Long]("ece_ppm") == ece), "ece must be constant")
    val wsum = rows.map(r => r.getAs[Long]("n_hold") * r.getAs[Long]("gap_ppm")).sum
    val n = rows.map(_.getAs[Long]("n_hold")).sum
    assert(ece == wsum / n, s"ece $ece != weighted mean ${wsum / n}")
    // ECE can't exceed the largest per-bin gap
    assert(ece <= rows.map(_.getAs[Long]("gap_ppm")).max)
  }

  test("q_cross_fold: folds partition the corpus, groups are atomic") {
    val rows = run("q_cross_fold")
    assert(rows.length >= 2 && rows.length <= 5)
    val total = graft.core.Tables.documents(spark, TestSpark.Sf0001).count()
    assert(rows.map(_.getAs[Long]("n_docs")).sum == total,
      "folds must partition the document set exactly")
    assert(rows.forall(_.getAs[Long]("leak_free") == 1L),
      "a source straddling folds breaks group atomicity")
    // shares in ppm sum to ~1e6 (DIV floors, so within nFolds of exact)
    val s = rows.map(_.getAs[Long]("share_ppm")).sum
    assert(s > 1000000 - rows.length && s <= 1000000)
  }

  test("q_negative_sampling: 4 draws per doc, no self-pairs, healthy coverage") {
    val rows = run("q_negative_sampling")
    assert(rows.map(_.getAs[Long]("k")).toSeq == Seq(1L, 2L, 3L, 4L))
    val nDocs = graft.core.Tables.documents(spark, TestSpark.Sf0001).count()
    rows.foreach { r =>
      assert(r.getAs[Long]("n_pairs") == nDocs)
      assert(r.getAs[Long]("distinct_negs") <= nDocs)
      // a uniform md5 draw over 500 ids from 500 draws covers ~63%; a
      // collapse below 40% would indict the hash mixing
      assert(r.getAs[Long]("coverage_ppm") > 400000,
        s"coverage collapsed: ${r.getAs[Long]("coverage_ppm")} ppm")
      assert(r.getAs[Long]("n_self_avoided") <= 5, "self-draws should be ~n/N")
    }
  }

  test("q_curriculum: cumulative token budget is monotone and closes the total") {
    val rows = run("q_curriculum")
    assert(rows.nonEmpty && rows.length <= 6)
    val stages = rows.map(_.getAs[Long]("stage"))
    assert(stages.sameElements(stages.sorted))
    val cums = rows.map(_.getAs[Long]("cum_tokens"))
    assert(cums.sameElements(cums.sorted), "cumulative budget must be monotone")
    assert(cums.last == rows.map(_.getAs[Long]("n_tokens")).sum)
    rows.foreach(r => assert(r.getAs[Long]("n_tokens") >= r.getAs[Long]("n_docs"),
      "every document has at least one whitespace token"))
  }
}
