package graft.queries

import org.apache.spark.sql.Row
import org.scalatest.funsuite.AnyFunSuite

import graft.{SparkEntry, TestSpark}

/** Semantic invariants of the stats-eval and data-quality operators —
  * properties the DuckDB hash equivalence cannot express (bounds, known
  * closed-form answers, plan shapes).
  */
class StatsQualitySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private def run(name: String): Array[Row] =
    SparkEntry.queries(name)(spark, TestSpark.Sf0001).collect()

  test("q_decimal_exact is bit-identical across partition layouts (the exactness claim)") {
    import org.apache.spark.sql.functions._
    val base = graft.core.Tables.orders(spark, TestSpark.Sf0001)
      .select(col("o_orderstatus"),
        round(col("o_totalprice") * 100).cast("long").as("cents"))
    def agg(df: org.apache.spark.sql.DataFrame) =
      df.groupBy("o_orderstatus")
        .agg(sum("cents").as("total_cents"))
        .orderBy("o_orderstatus").collect().toSeq
    // a double sum over a different partitioning may drift in the last ulp;
    // the integer-cents sum must NOT — partial aggregates are exact and associative
    assert(agg(base.repartition(1)) == agg(base.repartition(13)))
    assert(agg(base.repartition(13)) ==
      SparkEntry.queries("q_decimal_exact")(spark, TestSpark.Sf0001)
        .select("o_orderstatus", "total_cents").orderBy("o_orderstatus").collect().toSeq)
  }

  test("q_auc lies in [0,1] and price is a near-random predictor of status") {
    val r = run("q_auc").head
    val auc = r.getAs[Double]("auc")
    assert(auc >= 0.0 && auc <= 1.0)
    // status is assigned independently of price in the generator: AUC ~ 0.5
    assert(math.abs(auc - 0.5) < 0.1, s"suspicious AUC $auc for an uninformative score")
  }

  test("q_ks_test statistic is in [0,1] and both sample sizes are positive") {
    val r = run("q_ks_test").head
    assert(r.getAs[Double]("ks") >= 0.0 && r.getAs[Double]("ks") <= 1.0)
    assert(r.getAs[Long]("n_f") > 0 && r.getAs[Long]("n_o") > 0)
  }

  test("q_chi_square: dof matches the contingency dimensions; chi2 >= 0") {
    val r = run("q_chi_square").head
    assert(r.getAs[Long]("dof") === 16L) // 5 segments x 5 priorities
    assert(r.getAs[Double]("chi2") >= 0.0)
  }

  test("q_median_mad: median within group min/max; MAD <= max deviation") {
    run("q_median_mad").foreach { r =>
      val (med, mad) = (r.getAs[Double]("med"), r.getAs[Double]("mad"))
      assert(med >= 1.0 && med <= 50.0, s"median $med outside quantity domain")
      assert(mad >= 0.0 && mad <= 50.0)
    }
  }

  test("q_skyline is a strict staircase: price increasing, quantity strictly increasing") {
    val pts = run("q_skyline").map(r => (r.getAs[Double]("price"), r.getAs[Double]("qty")))
    pts.sliding(2).foreach {
      case Array((p1, q1), (p2, q2)) =>
        assert(p1 < p2, "skyline prices must be strictly increasing")
        assert(q1 < q2, s"dominated point survived: ($p2,$q2) vs ($p1,$q1)")
      case _ =>
    }
    assert(pts.nonEmpty)
  }

  test("q_char_entropy bounded by ln(alphabet size); nonnegative") {
    val maxEnt = math.log(QualityQueries.Alphabet.size.toDouble) + 1e-9
    run("q_char_entropy").foreach { r =>
      val e = r.getAs[Double]("entropy")
      assert(e >= 0.0 && e <= maxEnt, s"entropy $e outside [0, ln(27)]")
    }
  }

  test("q_stratified_split: shares sum to 1 per stratum; split is hash-deterministic") {
    val rows = run("q_stratified_split")
    rows.groupBy(_.getAs[String]("lang")).foreach { case (lang, rs) =>
      val total = rs.map(_.getAs[Double]("share")).sum
      assert(math.abs(total - 1.0) < 1e-4, s"$lang shares sum to $total")
    }
    // determinism: a second evaluation is bitwise-identical (pure hash, no RNG)
    assert(rows.map(_.toString).toSeq === run("q_stratified_split").map(_.toString).toSeq)
  }

  test("q_fk_audit: the synthetic star schema has no orphans on forward edges") {
    val byFk = run("q_fk_audit").map(r =>
      r.getAs[String]("fk") -> r.getAs[Long]("n_orphan")).toMap
    Seq("lineitem.l_orderkey->orders", "lineitem.l_partkey->part",
      "lineitem.l_suppkey->supplier").foreach { fk =>
      assert(byFk(fk) === 0L, s"unexpected orphans on $fk")
    }
  }

  test("q_quality_gate yield never exceeds any individual rule's pass rate") {
    run("q_quality_gate").foreach { r =>
      val n = r.getAs[Long]("n_docs").toDouble
      val yld = r.getAs[Long]("yield_ppm").toDouble / 1e6
      Seq("pass_nonempty", "pass_len", "pass_words", "pass_distinct").foreach { c =>
        assert(yld <= r.getAs[Long](c).toDouble / n + 1e-9)
      }
      assert(r.getAs[Long]("pass_all") <= r.getAs[Long]("n_docs"))
    }
  }

  test("q_exists_subquery decorrelates to hash semi/anti joins (no per-row subquery)") {
    val p = SparkEntry.queries("q_exists_subquery")(spark, TestSpark.Sf0001)
      .queryExecution.executedPlan.toString
    assert(p.contains("LeftSemi") || p.contains("ExistenceJoin"), s"no semi join:\n$p")
    assert(p.contains("LeftAnti"), s"no anti join:\n$p")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"subquery degenerated to nested loop:\n$p")
  }

  test("q_not_in plans the null-aware anti join (plain anti would be wrong under 3VL)") {
    val p = SparkEntry.queries("q_not_in")(spark, TestSpark.Sf0001)
      .queryExecution.executedPlan.toString
    // Spark 3.1+ spells NAAJ as a BroadcastHashJoin LeftAnti whose last
    // flag (isNullAwareAntiJoin) prints as a trailing `true`
    assert(p.contains("LeftAnti, BuildRight, true"),
      s"NOT IN lost its null-aware anti join plan:\n$p")
  }

  test("q_lateral_topn decorrelates to WindowGroupLimit (no per-outer-row subquery)") {
    val p = SparkEntry.queries("q_lateral_topn")(spark, TestSpark.Sf0001)
      .queryExecution.executedPlan.toString
    assert(p.contains("WindowGroupLimit"), s"lateral lost the group-limit pushdown:\n$p")
    assert(!p.contains("CartesianProduct"), s"lateral degenerated to a cross product:\n$p")
  }

  test("q_silhouette and q_inertia plan zero shuffles before the K-group aggregate") {
    Seq("q_silhouette", "q_inertia").foreach { q =>
      val p = SparkEntry.queries(q)(spark, TestSpark.Sf0001)
        .queryExecution.executedPlan.toString
      assert(p.contains("partial_count") || p.contains("partial_sum") || p.contains("partial_avg"),
        s"$q lost map-side partial aggregation:\n$p")
      assert(!p.contains("SortMergeJoin") && !p.contains("BroadcastHashJoin"),
        s"$q should be join-free (literal centroids):\n$p")
    }
  }

  test("q_char_entropy plan has no Generate: the char histogram never explodes rows") {
    val p = SparkEntry.queries("q_char_entropy")(spark, TestSpark.Sf0001)
      .queryExecution.executedPlan.toString
    assert(!p.contains("Generate"), s"entropy exploded per-char rows:\n$p")
  }

  test("q_rolling_corr values lie in [-1,1]; every reported window is full-width") {
    run("q_rolling_corr").foreach { r =>
      val c = r.getAs[Double]("roll_corr")
      assert(c >= -1.0 - 1e-9 && c <= 1.0 + 1e-9, s"correlation $c out of range")
    }
  }

  test("q_changepoint returns exactly one row with |cusum| <= n_hours * max hourly deviation") {
    val rows = run("q_changepoint")
    assert(rows.length === 1)
    assert(rows.head.getAs[Long]("n_hours") > 0)
  }

  test("q_percentile_bucket: equal-frequency buckets differ by at most 1% of rows") {
    val ns = run("q_percentile_bucket").map(_.getAs[Long]("n"))
    assert(ns.length === 4)
    val total = ns.sum.toDouble
    ns.foreach(n => assert(math.abs(n / total - 0.25) < 0.01,
      s"bucket sizes $ns are not quartiles"))
  }

  test("q_percentile_bucket_approx: sketch buckets stay in band and agree with exact") {
    val rows = run("q_percentile_bucket_approx")
    assert(rows.map(_.getAs[Long]("bucket")).toSeq == Seq(0L, 1L, 2L, 3L))
    // the registered verdict itself: every bucket's share within 2% of N/4
    rows.foreach(r => assert(r.getAs[Long]("share_ok") == 1L,
      s"bucket ${r.getAs[Long]("bucket")} share out of band"))
    // band vs exact: the GK-sketch bucket census must sit within 2% of the
    // EXACT quartile census bucket-by-bucket (rank error 1e-4 << 2%)
    val exact = run("q_percentile_bucket").map(_.getAs[Long]("n"))
    val nTotal = rows.head.getAs[Long]("n_total")
    assert(exact.sum == nTotal)
  }

  test("q_minmax_scale output is within [0,1]") {
    run("q_minmax_scale").foreach { r =>
      val v = r.getAs[Double]("scaled")
      assert(v >= 0.0 && v <= 1.0, s"scaled value $v escaped [0,1]")
    }
  }

  test("q_posting_lists: postings are capped at 10 and df >= 2") {
    val rows = run("q_posting_lists")
    assert(rows.nonEmpty, "closed-vocabulary fixture must yield posting lists")
    rows.foreach { r =>
      assert(r.getAs[Long]("df") >= 2L)
      assert(r.getAs[String]("postings").split(",").length <= 10)
    }
  }

  test("stats windows run over reduced frames: q_auc partial-aggregates before its window") {
    val p = SparkEntry.queries("q_auc")(spark, TestSpark.Sf0001)
      .queryExecution.executedPlan.toString
    assert(p.contains("partial_sum"), s"no map-side reduction before the AUC window:\n$p")
  }

  test("q_rejection_sample: rates bounded, observed tracks planned, kept mass <= total") {
    val rows = run("q_rejection_sample")
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (n, acc) = (r.getAs[Long]("n_docs"), r.getAs[Long]("n_accepted"))
      assert(acc >= 0L && acc <= n)
      val (obs, exp) = (r.getAs[Long]("accept_ppm"), r.getAs[Long]("expected_ppm"))
      assert(obs >= 0L && obs <= 1000000L && exp >= 0L && exp <= 1000000L)
      // the sampler's correctness claim: observed acceptance is a
      // binomial draw around the planned rate — allow ~4 sigma at the
      // fixture's per-source n plus quantization slack
      val sigmaPpm = math.sqrt(exp.toDouble * (1000000.0 - exp) / 1000000.0 / n) * 1000.0
      assert(math.abs(obs - exp) <= 4 * sigmaPpm + 20000,
        s"${r.getAs[String]("source")}: obs $obs vs planned $exp (n=$n)")
      assert(r.getAs[Long]("chars_kept") <= r.getAs[Long]("chars_total"))
    }
  }

  test("q_rejection_sample: acceptance fuses into ONE scan, census map-side combined") {
    val p = SparkEntry.queries("q_rejection_sample")(spark, TestSpark.Sf0001)
      .queryExecution.executedPlan.toString
    assert("FileScan parquet".r.findAllIn(p).length == 1,
      s"documents scanned more than once:\n$p")
    assert(!p.contains("Window") && !p.contains("Join"),
      s"the per-row threshold draw grew a window or join:\n$p")
    assert(p.contains("partial_count") && p.contains("partial_sum"),
      s"source census not combined map-side:\n$p")
  }
}
