package graft.queries

import org.apache.spark.sql.Row
import org.scalatest.funsuite.AnyFunSuite

import graft.{SparkEntry, TestSpark}

/** Semantic invariants of the classifier/ranker eval operators
  * (q_confusion_matrix, q_f1_eval, q_pr_curve, q_roc_points, q_cramers_v,
  * q_cohens_kappa, q_mannwhitney, q_levene). The byte-level cross-engine
  * check is the DuckDB oracle gate; these pin the STATISTICS' defining
  * identities so a refactor cannot silently change the semantics while
  * staying self-consistent on both engines.
  */
class EvalMetricsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private def run(name: String): Array[Row] =
    SparkEntry.queries(name)(spark, TestSpark.Sf0001).collect()

  test("q_confusion_matrix: mass = corpus size; diagonal carries the unflipped ~80%") {
    val rows = run("q_confusion_matrix")
    val total = rows.map(_.getAs[Long]("n")).sum
    val diag = rows.filter(r => r.getAs[Long]("actual") == r.getAs[Long]("pred"))
      .map(_.getAs[Long]("n")).sum
    val nVec = graft.core.Tables.embeddings(spark, TestSpark.Sf0001).count()
    assert(total == nVec)
    // FlipPct = 20: the diagonal holds the unflipped rows (binomial around
    // 0.8; the off-diagonal target is always a different class)
    assert(diag.toDouble / total > 0.7 && diag.toDouble / total < 0.9,
      s"diagonal share ${diag.toDouble / total} outside the flip design")
  }

  test("q_f1_eval: f1 is the ppm harmonic mean and micro-accuracy equals the diagonal share") {
    val rows = run("q_f1_eval")
    assert(rows.length == 10) // every label class present at sf0.001
    rows.foreach { r =>
      val (p, rec, f1) = (r.getAs[Long]("prec_ppm"), r.getAs[Long]("rec_ppm"),
        r.getAs[Long]("f1_ppm"))
      if (p + rec > 0) assert(f1 == 2 * p * rec / (p + rec))
      assert(p <= 1000000L && rec <= 1000000L)
    }
    val cm = run("q_confusion_matrix")
    val total = cm.map(_.getAs[Long]("n")).sum
    val diag = cm.filter(r => r.getAs[Long]("actual") == r.getAs[Long]("pred"))
      .map(_.getAs[Long]("n")).sum
    assert(rows.head.getAs[Long]("acc_ppm") == diag * 1000000L / total)
  }

  test("q_pr_curve / q_roc_points: monotone cumulative sweep, consistent totals") {
    val pr = run("q_pr_curve").sortBy(_.getAs[Long]("thr_bin"))
    val roc = run("q_roc_points").sortBy(_.getAs[Long]("thr_bin"))
    assert(pr.length == 10 && roc.length == 10)
    // raising the threshold can only shrink the predicted-positive set
    val tps = pr.map(_.getAs[Long]("tp"))
    assert(tps.zip(tps.tail).forall { case (lo, hi) => lo >= hi })
    // recall at the lowest threshold is 1 (everything predicted positive)
    assert(pr.head.getAs[Long]("rec_ppm") == 1000000L)
    assert(roc.head.getAs[Long]("tpr_ppm") == 1000000L &&
      roc.head.getAs[Long]("fpr_ppm") == 1000000L)
    // positives were shifted +0.3: the ranker must beat random — at every
    // interior threshold TPR > FPR
    roc.tail.foreach { r =>
      assert(r.getAs[Long]("tpr_ppm") >= r.getAs[Long]("fpr_ppm"),
        s"bin ${r.getAs[Long]("thr_bin")} under the diagonal")
    }
    // pr and roc agree on tp/fp at every threshold (shared base)
    pr.zip(roc).foreach { case (a, b) =>
      assert(a.getAs[Long]("tp") == b.getAs[Long]("tp") &&
        a.getAs[Long]("fp") == b.getAs[Long]("fp"))
    }
  }

  test("q_cramers_v: V in [0,1] and tied to q_chi_square's statistic") {
    val r = run("q_cramers_v").head
    val v = r.getAs[Double]("v")
    assert(v >= 0.0 && v <= 1.0)
    val chi = run("q_chi_square").head
    assert(r.getAs[Long]("n") == chi.getAs[Long]("n"))
    assert(math.abs(r.getAs[Double]("chi2") - chi.getAs[Double]("chi2")) < 1e-6)
    assert(r.getAs[Long]("dof") == chi.getAs[Long]("dof"))
  }

  test("q_cohens_kappa: po above pe (raters agree 75% by design), kappa consistent") {
    val r = run("q_cohens_kappa").head
    val (po, pe, kappa) = (r.getAs[Long]("po_ppm"), r.getAs[Long]("pe_ppm"),
      r.getAs[Long]("kappa_ppm"))
    assert(po > pe, s"po_ppm $po should exceed chance pe_ppm $pe")
    assert(po >= 700000L) // 75% of docs agree by construction (+ chance hits)
    assert(kappa == (po - pe) * 1000000L / (1000000L - pe))
  }

  test("q_mannwhitney: U within its range and symmetric complement") {
    val r = run("q_mannwhitney").head
    val (na, nb, u2a) = (r.getAs[Long]("n_a"), r.getAs[Long]("n_b"),
      r.getAs[Long]("u2_a"))
    // 0 <= U_a <= n_a*n_b  (2x-scaled)
    assert(u2a >= 0L && u2a <= 2 * na * nb, s"2U=$u2a outside [0, ${2 * na * nb}]")
    // both segments hash-sliced from the same price distribution: |z| small
    assert(math.abs(r.getAs[Double]("z")) < 5.0)
  }

  test("q_levene: F positive with the right dof; near 1 under equal spreads") {
    val r = run("q_levene").head
    assert(r.getAs[Long]("k") == 3)
    assert(r.getAs[Long]("df1") == 2)
    assert(r.getAs[Long]("df2") == r.getAs[Long]("n_rows") - 3)
    val f = r.getAs[Double]("f_bf")
    // return flags slice the same quantity distribution → no real spread
    // difference; F should sit well under any rejection region
    assert(f >= 0.0 && f < 10.0, s"F $f implausible for the null fixture")
  }
}
