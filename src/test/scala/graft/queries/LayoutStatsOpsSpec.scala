package graft.queries

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{SparkEntry, TestSpark}

/** Semantic invariants of the layout-census / resampling / LM operators
  * added in round-7 session 5 (q_zonemap_prune, q_rle_census,
  * q_sql_recursive, q_sql_tpch_q13, q_poisson_bootstrap, q_tukey_fences,
  * q_gini_concentration, q_kneser_ney, q_psi_drift, q_temperature_mix) —
  * properties the DuckDB hash gate cannot express.
  */
class LayoutStatsOpsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private def run(name: String): Array[Row] =
    SparkEntry.queries(name)(spark, TestSpark.Sf0001).collect()

  test("q_sql_recursive: 90 contiguous spine days; zero-fill preserves the order total") {
    val rows = run("q_sql_recursive")
    assert(rows.length === 90, "spine must emit one row per day, gaps included")
    val days = rows.map(_.getAs[java.sql.Date]("day").toLocalDate)
    days.sliding(2).foreach { case Array(a, b) =>
      assert(b === a.plusDays(1), s"spine gap between $a and $b")
    }
    val direct = graft.core.Tables.orders(spark, TestSpark.Sf0001)
      .filter(col("o_orderdate") >= lit("1996-01-01") &&
        col("o_orderdate") < lit("1996-03-31"))
      .count()
    assert(rows.map(_.getAs[Long]("n_orders")).sum === direct,
      "zero-filled daily census must preserve the window's order total")
  }

  test("q_sql_tpch_q13: histogram masses replay the customer and order totals") {
    val rows = run("q_sql_tpch_q13")
    val t = graft.core.Tables
    assert(rows.map(_.getAs[Long]("custdist")).sum ===
      t.customer(spark, TestSpark.Sf0001).count(),
      "every customer lands in exactly one count bucket")
    val nonUrgentOfKnown = t.orders(spark, TestSpark.Sf0001)
      .filter(col("o_orderpriority") =!= "1-URGENT")
      .join(t.customer(spark, TestSpark.Sf0001),
        col("o_custkey") === col("c_custkey"), "left_semi")
      .count()
    assert(rows.map(r => r.getAs[Long]("c_count") * r.getAs[Long]("custdist")).sum
      === nonUrgentOfKnown,
      "sum(c_count * custdist) must equal the filtered per-customer order mass")
  }

  test("q_zonemap_prune: census bounds are internally consistent") {
    val r = run("q_zonemap_prune").head
    val nBlocks = r.getAs[Long]("n_blocks")
    val nRows = r.getAs[Long]("n_rows")
    val scannedB = r.getAs[Long]("n_scanned_blocks")
    val scannedR = r.getAs[Long]("scanned_rows")
    val selected = r.getAs[Long]("selected_rows")
    assert(nRows === graft.core.Tables.lineitem(spark, TestSpark.Sf0001).count())
    assert(scannedB <= nBlocks)
    // zone maps can only over-read, never under-read
    assert(scannedR >= selected && scannedR <= nRows)
    assert(r.getAs[Long]("scan_ppm") === scannedR * 1000000L / nRows)
    assert(r.getAs[Long]("waste_x100") === scannedR * 100L / math.max(selected, 1L))
  }

  test("q_rle_census: prefix run counts are monotone and replay countDistinct") {
    val r = run("q_rle_census").head
    val (rf, rs, rd) = (r.getAs[Long]("runs_flag"), r.getAs[Long]("runs_status"),
      r.getAs[Long]("runs_day"))
    // finer prefixes can only split runs, never merge them
    assert(rf <= rs && rs <= rd && rd <= r.getAs[Long]("n_rows"))
    val direct = graft.core.Tables.lineitem(spark, TestSpark.Sf0001)
      .select(countDistinct(col("l_returnflag"))).head.getLong(0)
    assert(rf === direct)
    assert(r.getAs[Long]("rpr_flag") === r.getAs[Long]("n_rows") / rf)
  }

  test("q_poisson_bootstrap: point mean exact; SE within a sane band of analytic") {
    val r = run("q_poisson_bootstrap").head
    assert(r.getAs[Long]("n_replicates") === 16L)
    val direct = graft.core.Tables.orders(spark, TestSpark.Sf0001)
      .agg(avg(expr("CAST(round(o_totalprice * 100) AS BIGINT)"))).head.getDouble(0)
    assert(math.abs(r.getAs[Double]("point_mean_cents") - direct) < 1e-4)
    // Poisson-bootstrap SE should approximate sd/sqrt(n); allow a wide
    // band (B=16 replicates is noisy) but catch order-of-magnitude breaks
    val Row(sd: Double, n: Long) = graft.core.Tables.orders(spark, TestSpark.Sf0001)
      .agg(stddev(expr("CAST(round(o_totalprice * 100) AS BIGINT)")),
        count(lit(1))).head
    val analytic = sd / math.sqrt(n.toDouble)
    val se = r.getAs[Double]("boot_se_cents")
    assert(se > analytic / 3 && se < analytic * 3,
      s"bootstrap SE $se vs analytic $analytic out of band")
  }

  test("q_tukey_fences: quartile order, fence counts bounded, ppm replays") {
    run("q_tukey_fences").foreach { r =>
      val n = r.getAs[Long]("n")
      val below = r.getAs[Long]("n_below"); val above = r.getAs[Long]("n_above")
      assert(r.getAs[Double]("q1_cents") <= r.getAs[Double]("q3_cents"))
      // quartile fences can never flag more than half the mass per side
      assert(below + above <= n / 2)
      assert(r.getAs[Long]("out_ppm") === (below + above) * 1000000L / n)
    }
  }

  test("q_gini_concentration: G in [0,1); near-uniform fixture sources read as balanced") {
    val r = run("q_gini_concentration").head
    val g = r.getAs[Double]("gini")
    assert(g >= 0.0 && g < 1.0)
    // fixture sources are equal-sized by construction — the alarm must NOT ring
    assert(g < 0.2, s"uniform source mix read as concentrated: $g")
    val n = r.getAs[Long]("n_sources")
    assert(r.getAs[Long]("top_share_ppm") >= 1000000L / n,
      "top source share cannot be below the uniform share")
  }

  test("q_kneser_ney: positive cross-entropy; ppl replays from micro-nats; sane band") {
    val r = run("q_kneser_ney").head
    val meanU = r.getAs[Long]("mean_nll_micro")
    assert(meanU > 0L, "KN probabilities must be < 1 on a non-degenerate corpus")
    val ppl = r.getAs[Double]("ppl")
    // ppl derives from the same exact integer sum (floor-DIV vs full-precision
    // mean differ by < 1 micro-nat -> relative ppl slack ~1e-6)
    assert(math.abs(ppl - math.exp(meanU / 1e6)) / ppl < 1e-4)
    // smoothed bigram perplexity must beat the unsmoothed-vocab ceiling
    val vocab = graft.core.Tables.documents(spark, TestSpark.Sf0001)
      .select(explode(split(col("text"), " ")).as("w"))
      .select(countDistinct("w")).head.getLong(0)
    assert(ppl > 1.0 && ppl < vocab.toDouble,
      s"ppl $ppl outside (1, vocab=$vocab)")
  }

  test("q_psi_drift: PSI is non-negative; alert decided from the rounded value") {
    val r = run("q_psi_drift").head
    val psi = r.getAs[Double]("psi")
    // sum of (p-q)ln(p/q) terms is pointwise >= 0
    assert(psi >= 0.0)
    assert(r.getAs[Long]("n_bins") <= 16L, "bin cap breached")
    assert(r.getAs[Long]("alert") === (if (psi > 0.1) 1L else 0L))
    // same-distribution splits must not alert once the val side has enough
    // mass for the estimator (sf0.001's 5-doc val split is all sampling
    // noise — the honest statistical floor of PSI, not a code property, so
    // the no-false-alarm pin runs at sf0.01)
    val r2 = SparkEntry.queries("q_psi_drift")(spark, "/root/testdata/sf0.01")
      .collect().head
    assert(r2.getAs[Long]("alert") === 0L,
      s"hash-split halves of one corpus read as drifted: psi=${r2.getAs[Double]("psi")}")
  }

  test("q_temperature_mix: shares normalize; boost strictly favors low-resource langs") {
    val rows = run("q_temperature_mix")
    val qs = rows.map(_.getAs[Double]("q_share"))
    assert(math.abs(qs.sum - 1.0) < 1e-6, s"q shares must normalize: ${qs.sum}")
    // q = p^0.3/Z is monotone in p, but boost q/p = p^-0.7/Z is ANTI-monotone:
    // the smallest language gets the largest boost
    val byTokens = rows.sortBy(_.getAs[Long]("n_tokens"))
    val boosts = byTokens.map(_.getAs[Double]("boost"))
    assert(boosts.zip(boosts.tail).forall { case (a, b) => a >= b },
      s"boost not anti-monotone in token mass: ${boosts.toSeq}")
    // temperature flattens, never inverts: q ordering still follows p ordering
    val qByTokens = byTokens.map(_.getAs[Double]("q_share"))
    assert(qByTokens.zip(qByTokens.tail).forall { case (a, b) => a <= b })
  }
}
