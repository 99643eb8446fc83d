package graft.queries

import org.scalatest.funsuite.AnyFunSuite

import graft.{SparkEntry, TestSpark}

/** Semantic invariants of q_ses_forecast (exact-integer exponential
  * smoothing), q_dp_count (deterministic-noise DP release), and
  * q_position_bias (IPW counterfactual CTR). The cross-engine byte check
  * is the DuckDB oracle gate; these pin the recursions and bounds.
  */
class ForecastPrivacySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("q_ses_forecast: fold matches a driver-side replay of the integer recursion") {
    val rows = SparkEntry.queries("q_ses_forecast")(spark, TestSpark.Sf0001).collect()
    assert(rows.nonEmpty)
    val daily = graft.core.Tables.events(spark, TestSpark.Sf0001)
      .groupBy(org.apache.spark.sql.functions.col("event_type"),
        org.apache.spark.sql.functions.to_date(
          org.apache.spark.sql.functions.col("ts")).as("day"))
      .count().collect()
      .map(r => (r.getString(0), r.getAs[java.sql.Date]("day").toString, r.getLong(2)))
    val byType = daily.groupBy(_._1)
    rows.foreach { r =>
      val t = r.getAs[String]("event_type")
      val xs = byType(t).sortBy(_._2).map(_._3)
      var s = xs.head
      var sae = 0L
      xs.tail.foreach { x => sae += math.abs(x - s); s = (x + s) / 2 }
      assert(r.getAs[Long]("level") == s, s"$t level")
      assert(r.getAs[Long]("sae") == sae, s"$t sae")
      assert(r.getAs[Long]("n_days") == xs.length.toLong)
      assert(r.getAs[Long]("mae_milli") ==
        (if (xs.length > 1) sae * 1000 / (xs.length - 1) else 0L))
    }
  }

  test("q_dp_count: noise bounded by the Laplace scale, release clamped at zero") {
    val rows = SparkEntry.queries("q_dp_count")(spark, TestSpark.Sf0001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val noise = r.getAs[Long]("noise")
      assert(math.abs(noise) <= 10, s"noise $noise exceeds scale")
      assert(r.getAs[Long]("n_released") ==
        math.max(r.getAs[Long]("n_true") + noise, 0L))
    }
  }

  test("q_cuped: adjusted means conserve the pooled mean and rho2 is a squared correlation") {
    val rows = SparkEntry.queries("q_cuped")(spark, TestSpark.Sf0001).collect()
    assert(rows.length == 2)
    val rho2 = rows.head.getAs[Double]("rho2")
    assert(rho2 >= 0.0 && rho2 <= 1.0)
    // CUPED is mean-preserving in the pooled sense: the n-weighted mean of
    // the adjusted means equals the n-weighted mean of the raw means
    // (the theta term cancels by construction of the global pre-mean)
    val n = rows.map(_.getAs[Long]("n_users").toDouble)
    val raw = rows.map(_.getAs[Double]("mean_post"))
    val adj = rows.map(_.getAs[Double]("mean_adj"))
    val wRaw = (raw, n).zipped.map(_ * _).sum / n.sum
    val wAdj = (adj, n).zipped.map(_ * _).sum / n.sum
    assert(math.abs(wRaw - wAdj) < 1e-3, s"CUPED shifted the pooled mean: $wRaw vs $wAdj")
  }

  test("q_diff_in_diff: DID recombines from its own cell means") {
    val r = SparkEntry.queries("q_diff_in_diff")(spark, TestSpark.Sf0001).collect().head
    assert(r.getAs[Long]("did_milli") ==
      (r.getAs[Long]("m_t_post") - r.getAs[Long]("m_t_pre")) -
        (r.getAs[Long]("m_c_post") - r.getAs[Long]("m_c_pre")))
    Seq("n_t_pre", "n_t_post", "n_c_pre", "n_c_post")
      .foreach(c => assert(r.getAs[Long](c) > 0, s"empty cell $c"))
  }

  test("q_source_ablation: ablation deltas sign-balance around the corpus metric") {
    val rows = SparkEntry.queries("q_source_ablation")(spark, TestSpark.Sf0001).collect()
    assert(rows.length > 1)
    // removing an above-average source lowers the metric and vice versa;
    // with >1 source both directions must exist unless all equal
    val deltas = rows.map(_.getAs[Long]("delta_ppm"))
    assert(deltas.exists(_ <= 0) && deltas.exists(_ >= 0))
    val m = rows.map(_.getAs[Long]("metric_all_milli")).distinct
    assert(m.size == 1, "corpus metric must be identical on every row")
  }

  test("q_als_step: one alternation strictly improves the v0-model fit per item") {
    val rows = SparkEntry.queries("q_als_step")(spark, TestSpark.Sf0001).collect()
    assert(rows.nonEmpty)
    // recompute SSE under the INITIAL v0 = 1000 (i.e. predictions u*1)
    // and check the re-solved v1 does not do worse — the defining ALS
    // property (each half-solve is the least-squares optimum given the
    // other side, up to the milli-grid truncation)
    import org.apache.spark.sql.functions._
    val ev = graft.core.Tables.events(spark, TestSpark.Sf0001)
      .groupBy(col("user_id"), col("event_type").as("item"))
      .agg(expr("CAST(sum(CAST(round(value * 1000) AS BIGINT)) AS BIGINT)").as("r"))
    val u = ev.groupBy("user_id")
      .agg(expr("CAST(sum(r * 1000) DIV (sum(CAST(1000000 AS BIGINT)) DIV 1000) AS BIGINT)")
        .as("u"))
    val sse0 = ev.join(u, "user_id")
      .withColumn("res", col("r") - col("u"))
      .groupBy("item").agg(sum(col("res") * col("res")).as("sse0"))
      .collect().map(r => r.getAs[String]("item") -> r.getAs[Long]("sse0")).toMap
    rows.foreach { r =>
      val item = r.getAs[String]("item")
      // milli-grid truncation can cost at most a hair; allow 0.1% slack
      assert(r.getAs[Long]("sse_milli2") <= (sse0(item) * 1001) / 1000,
        s"$item: re-solved SSE ${r.getAs[Long]("sse_milli2")} worse than v0 fit ${sse0(item)}")
    }
  }

  test("q_substring_dup: position mass conserves and a planted duplicate is detected") {
    val rows = SparkEntry.queries("q_substring_dup")(spark, TestSpark.Sf0001).collect()
    assert(rows.nonEmpty)
    import org.apache.spark.sql.functions._
    val expected = graft.core.Tables.documents(spark, TestSpark.Sf0001)
      .select(sum(greatest(length(col("text")) - lit(31), lit(0))).as("p"))
      .collect().head.getLong(0)
    assert(rows.map(_.getAs[Long]("n_positions")).sum == expected,
      "every >=32-char position must be counted exactly once")
    rows.foreach { r =>
      assert(r.getAs[Long]("n_dup_positions") >= r.getAs[Long]("n_cross_source_positions"),
        "cross-source duplication is a subset of duplication")
      assert(r.getAs[Long]("n_dup_positions") <= r.getAs[Long]("n_positions"))
    }
  }

  test("q_markov_transitions: rows are a proper conditional distribution") {
    val rows = SparkEntry.queries("q_markov_transitions")(spark, TestSpark.Sf0001).collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getAs[String]("cur")).foreach { case (cur, rs) =>
      val pSum = rs.map(_.getAs[Long]("p_ppm")).sum
      // truncating ppm division loses at most (branches - 1) ppm
      assert(pSum <= 1000000 && pSum > 1000000 - rs.length,
        s"$cur: conditional row sums to $pSum ppm")
    }
    // transition mass = events minus one per user (no successor for the last)
    val ev = graft.core.Tables.events(spark, TestSpark.Sf0001)
    val expected = ev.count() -
      ev.select("user_id").distinct().count()
    assert(rows.map(_.getAs[Long]("n")).sum == expected)
  }

  test("q_wilson_rank: the bound shrinks toward zero and never exceeds the raw rate") {
    val rows = SparkEntry.queries("q_wilson_rank")(spark, TestSpark.Sf0001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val lb = r.getAs[Double]("wilson_lb")
      val rate = r.getAs[Long]("rate_ppm").toDouble / 1e6
      assert(lb >= 0.0 && lb <= rate + 1e-9,
        s"Wilson LB must lower-bound the raw rate: $r")
    }
    val rks = rows.map(_.getAs[Int]("rk")).sorted
    assert(rks.sameElements(1 to rows.length))
  }

  test("q_uplift_deciles: cumulative column recombines from per-decile uplifts best-first") {
    val rows = SparkEntry.queries("q_uplift_deciles")(spark, TestSpark.Sf0001).collect()
    assert(rows.nonEmpty)
    val byDecileDesc = rows.sortBy(-_.getAs[Long]("decile"))
    var cum = 0L
    byDecileDesc.foreach { r =>
      assert(r.getAs[Long]("uplift_milli") ==
        r.getAs[Long]("m_t_milli") - r.getAs[Long]("m_c_milli"))
      cum += r.getAs[Long]("uplift_milli")
      assert(r.getAs[Long]("cum_uplift_milli") == cum, s"cum broken at $r")
      assert(r.getAs[Long]("n_t") > 0 && r.getAs[Long]("n_c") > 0)
    }
  }

  test("q_data_contract: the fixture satisfies its own contract, and rates recombine") {
    val rows = SparkEntry.queries("q_data_contract")(spark, TestSpark.Sf0001).collect()
    assert(rows.length == 9)
    rows.foreach { r =>
      assert(r.getAs[Long]("viol_ppm") ==
        r.getAs[Long]("n_violations") * 1000000 / r.getAs[Long]("n_rows"))
      assert((r.getAs[Long]("pass") == 1L) == (r.getAs[Long]("n_violations") == 0L))
    }
    // the driver fixture is clean by construction — every check passes
    assert(rows.forall(_.getAs[Long]("pass") == 1L),
      s"fixture violates its own contract: ${rows.filter(_.getAs[Long]("pass") == 0L).mkString}")
  }

  test("q_item_cf: cos2 bounded by 1 and symmetric-by-construction pairs are canonical") {
    val rows = SparkEntry.queries("q_item_cf")(spark, TestSpark.Sf0001).collect()
    assert(rows.length == 10) // C(5,2) event-type pairs
    rows.foreach { r =>
      val c = r.getAs[Double]("cos2")
      assert(c >= 0.0 && c <= 1.0 + 1e-9, s"Cauchy-Schwarz violated: $r")
      assert(r.getAs[String]("item_a") < r.getAs[String]("item_b"))
      assert(r.getAs[Long]("n_common_users") > 0)
    }
  }

  test("q_position_bias: IPW lifts the position-discounted naive CTR") {
    val rows = SparkEntry.queries("q_position_bias")(spark, TestSpark.Sf0001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("clicks") <= r.getAs[Long]("n"))
      // each click's weight pos >= 1, so the IPW estimate dominates naive;
      // the planted bias (click prob ~ 1/pos) makes it strictly larger
      assert(r.getAs[Long]("ipw_ctr_ppm") >= r.getAs[Long]("naive_ctr_ppm"))
      // the cascade design has E[click*pos] ~ 0.3 per impression: the IPW
      // estimate should land well above the confounded naive read
      assert(r.getAs[Long]("ipw_ctr_ppm") > 2 * r.getAs[Long]("naive_ctr_ppm"),
        s"IPW failed to de-bias: $r")
    }
  }
}
