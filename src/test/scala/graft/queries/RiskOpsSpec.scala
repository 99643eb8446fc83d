package graft.queries

import org.apache.spark.sql.Row
import org.scalatest.funsuite.AnyFunSuite

import graft.{SparkEntry, TestSpark}

/** Semantic invariants of the risk/forecast diagnostics (q_backtest_naive,
  * q_woe_iv, q_gains_table, q_target_encode, q_selfjoin_forecast,
  * q_conformal_interval, q_benford, q_anomaly_robust).
  */
class RiskOpsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private def run(name: String, dir: String = TestSpark.Sf0001): Array[Row] =
    SparkEntry.queries(name)(spark, dir).collect()

  test("q_backtest_naive: cells bounded by the grid, cold cells a subset") {
    val rows = run("q_backtest_naive")
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_cells") <= 168L, "more cells than dow x hour slots")
      assert(r.getAs[Long]("n_cold_cells") <= r.getAs[Long]("n_cells"))
      assert(r.getAs[Long]("mae_x100") >= 0L)
    }
  }

  test("q_woe_iv: IV non-negative and equal to the sum of its terms") {
    val rows = run("q_woe_iv")
    val orders = graft.core.Tables.orders(spark, TestSpark.Sf0001).count()
    assert(rows.map(r => r.getAs[Long]("n_good") + r.getAs[Long]("n_bad")).sum === orders)
    val iv = rows.head.getAs[Double]("iv")
    // IV has the same pointwise-nonnegative form as PSI
    assert(iv >= 0.0)
    assert(math.abs(rows.map(_.getAs[Double]("iv_term")).sum - iv) < 1e-4,
      "per-bin terms must reassemble the feature IV")
  }

  test("q_gains_table: top decile anchors gains at 100%, lift at 1.0") {
    val rows = run("q_gains_table").sortBy(_.getAs[Long]("decile"))
    val orders = graft.core.Tables.orders(spark, TestSpark.Sf0001).count()
    assert(rows.map(_.getAs[Long]("n")).sum === orders)
    // decile 0 row carries the cumulative-from-top totals: all responders
    assert(rows.head.getAs[Long]("cum_gain_ppm") === 1000000L)
    assert(rows.head.getAs[Long]("cum_lift_x100") === 100L)
    // cumulative gain shrinks as the window drops top deciles
    val gains = rows.map(_.getAs[Long]("cum_gain_ppm"))
    assert(gains.zip(gains.tail).forall { case (a, b) => a >= b })
  }

  test("q_target_encode: shrinkage lands every category between raw rate and prior") {
    val rows = run("q_target_encode")
    val orders = graft.core.Tables.orders(spark, TestSpark.Sf0001).count()
    assert(rows.map(_.getAs[Long]("n")).sum === orders)
    val ft = rows.map(_.getAs[Long]("n_f")).sum
    val priorPpm = ft * 1000000L / orders
    rows.foreach { r =>
      val (raw, enc) = (r.getAs[Long]("raw_ppm"), r.getAs[Long]("enc_ppm"))
      val lo = math.min(raw, priorPpm) - 1 // integer-DIV slack
      val hi = math.max(raw, priorPpm) + 1
      assert(enc >= lo && enc <= hi,
        s"encoding $enc escaped the [raw=$raw, prior=$priorPpm] shrinkage band")
    }
  }

  test("q_selfjoin_forecast: estimator replays exactly and lands in the sampling band") {
    val r = run("q_selfjoin_forecast").head
    assert(r.getAs[Long]("n_sampled_keys") <= r.getAs[Long]("n_keys"))
    assert(r.getAs[Long]("err_x100") ===
      r.getAs[Long]("est_pairs") * 100L / math.max(r.getAs[Long]("actual_pairs"), 1L))
    // md5 sampling is deterministic, so this band can never flake; a break
    // means the estimator math changed (sf0.001 measures 67, sf0.01 92)
    assert(r.getAs[Long]("err_x100") > 25L && r.getAs[Long]("err_x100") < 400L)
  }

  test("q_conformal_interval: empirical coverage near the nominal 90% at sf0.01") {
    run("q_conformal_interval", "/root/testdata/sf0.01").foreach { r =>
      val cov = r.getAs[Long]("coverage_ppm")
      // n_test ~ 1000 per type: binomial noise ~ +-3%; theory pins ~90%
      assert(cov > 850000L && cov < 950000L,
        s"${r.getAs[String]("event_type")}: coverage $cov escapes the conformal band")
    }
  }

  test("q_benford: digit census complete, expected shares match the law") {
    val rows = run("q_benford").sortBy(_.getAs[Long]("digit"))
    assert(rows.map(_.getAs[Long]("digit")).toSeq === (1L to 9L))
    val expected = (1 to 9).map(d => math.round(math.log10(1.0 + 1.0 / d) * 1e6))
    assert(rows.map(_.getAs[Long]("exp_ppm")).toSeq === expected)
    // ppm shares must reassemble the corpus (integer-DIV slack per row)
    val s = rows.map(_.getAs[Long]("obs_ppm")).sum
    assert(s > 1000000L - 9 && s <= 1000000L)
    assert(rows.head.getAs[Double]("mad") >= 0.0)
  }

  test("q_survival_km: at-risk telescopes, survival monotone in [0,1]") {
    val rows = run("q_survival_km").sortBy(_.getAs[Long]("t"))
    rows.sliding(2).foreach {
      case Array(a, b) =>
        // at-risk mass at t equals at-risk at the next t plus everyone
        // whose (possibly censored) lifetime ended at t
        assert(a.getAs[Long]("n_at_risk") - b.getAs[Long]("n_at_risk") ===
          a.getAs[Long]("n_deaths") + a.getAs[Long]("n_censored"))
        assert(a.getAs[Double]("survival") >= b.getAs[Double]("survival") - 1e-9)
      case _ =>
    }
    rows.foreach { r =>
      val sv = r.getAs[Double]("survival")
      assert(sv >= 0.0 && sv <= 1.0)
      assert(r.getAs[Long]("n_deaths") + r.getAs[Long]("n_censored") <=
        r.getAs[Long]("n_at_risk"))
    }
  }

  test("q_slice_finder: top-5 by a replayable support-scaled deviation") {
    val rows = run("q_slice_finder")
    assert(rows.length === 5)
    val scores = rows.map(_.getAs[Long]("dev_score"))
    assert(scores.zip(scores.tail).forall { case (a, b) => a >= b })
    rows.foreach { r =>
      assert(r.getAs[Long]("rate_ppm") ===
        r.getAs[Long]("n_f") * 1000000L / r.getAs[Long]("n"))
      assert(r.getAs[Long]("n_f") <= r.getAs[Long]("n"))
    }
  }

  test("q_anomaly_robust: flags a minority; masses reassemble the fact") {
    val rows = run("q_anomaly_robust")
    val li = graft.core.Tables.lineitem(spark, TestSpark.Sf0001).count()
    assert(rows.map(_.getAs[Long]("n")).sum === li)
    rows.foreach { r =>
      // MAD-based fences can never flag half the mass (median splits it)
      assert(r.getAs[Long]("out_ppm") < 500000L)
      assert(r.getAs[Double]("mad_cents") >= 0.0)
      assert(r.getAs[Long]("n_outliers") <= r.getAs[Long]("n"))
    }
  }
}
