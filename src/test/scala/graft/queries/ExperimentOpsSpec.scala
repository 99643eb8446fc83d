package graft.queries

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{SparkEntry, TestSpark}

/** Semantic invariants of the experiment-design operators (q_mde_power,
  * q_simpson_flip, q_sprt). Byte-level cross-engine equality lives in the
  * oracle gate; these pin the statistics' defining identities — monotone
  * power→MDE, the exact-BigInt sign the double product tree must agree
  * with, and the SPRT ledger arithmetic — so a refactor cannot drift both
  * engines in lockstep.
  */
class ExperimentOpsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private def run(name: String): Array[Row] =
    SparkEntry.queries(name)(spark, TestSpark.Sf0001).collect()

  test("q_mde_power: higher power demands a larger MDE; both positive") {
    val rows = run("q_mde_power").sortBy(_.getAs[Long]("power_pct"))
    assert(rows.map(_.getAs[Long]("power_pct")).toSeq == Seq(80L, 90L))
    val m80 = rows(0).getAs[Double]("mde")
    val m90 = rows(1).getAs[Double]("mde")
    assert(m80 > 0.0 && m90 > m80, s"mde80=$m80 mde90=$m90")
    // the z-ratio pins the two MDEs to each other: (z_a + z_90)/(z_a + z_80)
    val ratio = (1.959964 + 1.281552) / (1.959964 + 0.841621)
    assert(math.abs(m90 / m80 - ratio) < 1e-3)
    rows.foreach(r => assert(r.getAs[Double]("mde_rel_pct") > 0.0))
  }

  test("q_simpson_flip: double-product signs agree with exact BigInt signs") {
    val rows = run("q_simpson_flip")
    assert(rows.nonEmpty)
    // exact recomputation: the operator's ulp-safety argument says the
    // IEEE product compare can never disagree with exact integer math
    val li = graft.core.Tables.lineitem(spark, TestSpark.Sf0001)
      .selectExpr("l_returnflag AS segment", "CAST(l_quantity AS BIGINT) AS x",
        "CAST(round(l_extendedprice * 100) AS BIGINT) AS y")
      .collect()
    def sign(rows: Seq[(Long, Long)]): Int = {
      val n = BigInt(rows.size)
      val sx = rows.map(r => BigInt(r._1)).sum
      val sy = rows.map(r => BigInt(r._2)).sum
      val sxy = rows.map(r => BigInt(r._1) * BigInt(r._2)).sum
      (n * sxy - sx * sy).signum
    }
    val bySeg = li.groupBy(_.getAs[String]("segment"))
      .map { case (k, v) => k -> v.toSeq.map(r => (r.getAs[Long]("x"), r.getAs[Long]("y"))) }
    val globalSign = sign(li.toSeq.map(r => (r.getAs[Long]("x"), r.getAs[Long]("y"))))
    rows.foreach { r =>
      val seg = r.getAs[String]("segment")
      assert(r.getAs[Long]("sign_seg") == sign(bySeg(seg)).toLong)
      assert(r.getAs[Long]("sign_global") == globalSign.toLong)
      assert(r.getAs[Long]("simpson_flip") ==
        (if (r.getAs[Long]("sign_seg") * r.getAs[Long]("sign_global") < 0) 1L else 0L))
    }
  }

  test("q_sprt: LLR ledger arithmetic and decision/crossing consistency") {
    val rows = run("q_sprt")
    assert(rows.length == 2)
    val nEvents = graft.core.Tables.events(spark, TestSpark.Sf0001).count()
    assert(rows.map(_.getAs[Long]("n_obs")).sum == nEvents)
    rows.foreach { r =>
      val nS = r.getAs[Long]("n_succ"); val n = r.getAs[Long]("n_obs")
      assert(r.getAs[Long]("llr_micronat") == nS * 200671L + (n - nS) * -50010L)
      val fcb = r.getAs[Long]("first_cross_bucket")
      val dec = r.getAs[String]("decision")
      assert((fcb == -1L) == (dec == "continue"), s"fcb=$fcb dec=$dec")
      assert(Set("accept_h1", "accept_h0", "continue").contains(dec))
    }
  }

  test("q_srm_check: user mass conserved, chi2 identity, alarm rule") {
    val rows = run("q_srm_check")
    val all = rows.filter(_.getAs[String]("segment") == "__ALL__")
    assert(all.length == 1)
    val users = graft.core.Tables.events(spark, TestSpark.Sf0001)
      .select("user_id").distinct().count()
    assert(all.head.getAs[Long]("n0") + all.head.getAs[Long]("n1") == users)
    rows.foreach { r =>
      val (n0, n1) = (r.getAs[Long]("n0"), r.getAs[Long]("n1"))
      val chi2 = (n0 - n1) * (n0 - n1) * 1000000L / (n0 + n1)
      assert(r.getAs[Long]("chi2_ppm") == chi2)
      assert(r.getAs[Long]("srm_alarm") == (if (chi2 > 3841459L) 1L else 0L))
    }
  }

  test("q_qte: per-arm quantiles monotone; deltas consistent") {
    val rows = run("q_qte").sortBy(_.getAs[Long]("p_pct"))
    assert(rows.map(_.getAs[Long]("p_pct")).toSeq == (1 to 9).map(_ * 10L))
    def mono(c: String) = {
      val v = rows.map(_.getAs[Long](c))
      v.zip(v.tail).forall { case (a, b) => a <= b }
    }
    assert(mono("q_treated_milli") && mono("q_control_milli"))
    rows.foreach(r => assert(r.getAs[Long]("qte_milli") ==
      r.getAs[Long]("q_treated_milli") - r.getAs[Long]("q_control_milli")))
  }

  test("q_logrank: total over fully-censored input; O/E/V invariants") {
    // the sf0.001 fixture is FULLY CENSORED: 15 users, every one active
    // inside dmax−7, so zero deaths survive the d>0 filter and the
    // operator must emit the pinned degenerate row, never NULLs
    val r = run("q_logrank").head
    val nTimes = r.getAs[Long]("n_times")
    assert(r.getAs[Double]("v") >= 0.0)
    assert(r.getAs[Double]("chi2") >= 0.0)
    assert(r.getAs[Long]("curves_differ") ==
      (if (r.getAs[Double]("chi2") > 3.841459) 1L else 0L))
    if (nTimes == 0L) {
      // degenerate branch: all aggregates pinned to exact zeros
      assert(r.getAs[Long]("o1") == 0L)
      assert(r.getAs[Double]("e1") == 0.0)
      assert(r.getAs[Double]("v") == 0.0)
      assert(r.getAs[Double]("chi2") == 0.0)
      assert(r.getAs[Long]("curves_differ") == 0L)
    } else {
      // non-degenerate: the hash split carries no real effect, so O
      // stays within a few sigma of E
      val o = r.getAs[Long]("o1").toDouble
      val e = r.getAs[Double]("e1")
      assert(math.abs(o - e) <= 6.0 * math.sqrt(r.getAs[Double]("v")) + 1.0,
        s"o=$o e=$e v=${r.getAs[Double]("v")}")
    }
  }

  test("q_logrank: non-degenerate branch on a synthetic cohort with deaths") {
    // synthetic events: 8 users whose last activity ends well before
    // dmax−7 (deaths) and 4 users active through the end (censored) —
    // exercises the O−E/V fold the fixture's full censoring never reaches
    val tmp = java.nio.file.Files.createTempDirectory("logrank_synth").toString
    val rows = (1 to 12).flatMap { u =>
      val lastDay = if (u <= 8) 2 + u else 29 // users 1..8 die on day 3..10
      Seq(0, lastDay).map { day =>
        (u.toLong * 100 + day,
         java.sql.Timestamp.valueOf(f"2024-01-${day + 1}%02d 12:00:00"),
         u.toLong, "click", 1.0, "{}")
      }
    }
    import spark.implicits._
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .repartition(2).write.mode("overwrite").parquet(s"$tmp/events.parquet")
    val r = SparkEntry.queries("q_logrank")(spark, tmp).collect().head
    assert(r.getAs[Long]("n_times") > 0)
    assert(r.getAs[Long]("o1") > 0)
    assert(r.getAs[Double]("e1") > 0.0)
    assert(r.getAs[Double]("v") > 0.0)
    assert(r.getAs[Long]("curves_differ") ==
      (if (r.getAs[Double]("chi2") > 3.841459) 1L else 0L))
  }

  test("q_rank_corr: both coefficients in [-1e6, 1e6] and recompute exactly") {
    val row = run("q_rank_corr").head
    val n = row.getAs[Long]("n")
    assert(row.getAs[Long]("n_pairs") == n * (n - 1) / 2)
    val rho = row.getAs[Long]("spearman_ppm")
    val tau = row.getAs[Long]("kendall_ppm")
    assert(rho >= -1000000L && rho <= 1000000L)
    assert(tau >= -1000000L && tau <= 1000000L)
    // independent recomputation over the collected source stats
    val src = graft.core.Tables.documents(spark, TestSpark.Sf0001)
      .selectExpr("source", "size(split(text, ' ')) AS t")
      .groupBy("source").agg(sum("t").as("tokens"), count(lit(1)).as("docs"))
      .collect().map(r => (r.getAs[String]("source"), r.getAs[Long]("tokens"),
        r.getAs[Long]("docs")))
    val rTok = src.sortBy(s => (-s._2, s._1)).zipWithIndex
      .map { case (s, i) => s._1 -> (i + 1L) }.toMap
    val rDoc = src.sortBy(s => (-s._3, s._1)).zipWithIndex
      .map { case (s, i) => s._1 -> (i + 1L) }.toMap
    val sd2 = src.map(s => { val d = rTok(s._1) - rDoc(s._1); d * d }).sum
    assert(rho == 1000000L - 6 * sd2 * 1000000L / (n * (n * n - 1)))
    val conc = (for {
      i <- src.indices; j <- (i + 1) until src.length
      a = src(i)._1; b = src(j)._1
    } yield if ((rTok(a) < rTok(b)) == (rDoc(a) < rDoc(b))) 1L else 0L).sum
    assert(row.getAs[Long]("n_concordant") == conc)
  }

  test("q_effective_n: Kish bounds — 1 <= n_eff <= n, deff >= 1") {
    val rows = run("q_effective_n")
    assert(rows.length == 6) // 5 types + __ALL__
    rows.foreach { r =>
      val n = r.getAs[Long]("n"); val ne = r.getAs[Double]("n_eff")
      assert(ne >= 1.0 - 1e-9 && ne <= n.toDouble + 1e-6,
        s"${r.getAs[String]("segment")}: n_eff $ne outside [1, $n]")
      assert(r.getAs[Double]("deff") >= 1.0 - 1e-4)
    }
  }

  test("q_join_asof_nearest: every match is genuinely the nearest order") {
    val rows = run("q_join_asof_nearest")
    assert(rows.nonEmpty)
    val orders = graft.core.Tables.orders(spark, TestSpark.Sf0001)
      .selectExpr("o_custkey", "unix_micros(CAST(o_orderdate AS TIMESTAMP)) AS t",
        "o_orderkey").collect()
      .groupBy(_.getAs[Long]("o_custkey"))
      .view.mapValues(_.map(r => (r.getAs[Long]("t"), r.getAs[Long]("o_orderkey"))).toSeq)
      .toMap
    val events = graft.core.Tables.events(spark, TestSpark.Sf0001)
      .selectExpr("event_id", "user_id", "unix_micros(ts) AS t").collect()
      .map(r => r.getAs[Long]("event_id") ->
        (r.getAs[Long]("user_id"), r.getAs[Long]("t"))).toMap
    rows.foreach { r =>
      val (u, t) = events(r.getAs[Long]("event_id"))
      orders.get(u) match {
        case None => assert(r.isNullAt(r.fieldIndex("nearest_order")))
        case Some(os) =>
          val minDist = os.map(o => math.abs(o._1 - t)).min
          assert(r.getAs[Long]("delta_us") == minDist,
            s"event ${r.getAs[Long]("event_id")}: ${r.getAs[Long]("delta_us")} vs $minDist")
      }
    }
  }

  test("q_lorenz_points: curve below the diagonal, monotone, ends at 100%") {
    val rows = run("q_lorenz_points").sortBy(_.getAs[Long]("decile"))
    assert(rows.nonEmpty)
    val mass = rows.map(_.getAs[Long]("mass_share_ppm"))
    assert(mass.zip(mass.tail).forall { case (a, b) => a <= b }, "mass share not monotone")
    rows.foreach { r =>
      // Lorenz property: cumulative mass share <= population share
      // (ascending order puts the lightest sources first)
      assert(r.getAs[Long]("mass_share_ppm") <= r.getAs[Long]("pop_share_ppm") + 1)
      assert(r.getAs[Long]("hhi_ppm") >= 1000000L / r.getAs[Long]("n_sources") - 1)
    }
    val last = rows.last
    assert(last.getAs[Long]("decile") == 10L)
    assert(last.getAs[Long]("pop_share_ppm") == 1000000L)
    assert(last.getAs[Long]("mass_share_ppm") == 1000000L)
  }

  test("q_burstiness: dispersion recomputes from the raw hourly counts") {
    val rows = run("q_burstiness")
    assert(rows.nonEmpty)
    val hourly = graft.core.Tables.events(spark, TestSpark.Sf0001)
      .selectExpr("event_type", "unix_micros(ts) DIV 3600000000 AS hi")
      .groupBy("event_type", "hi").count()
      .collect().groupBy(_.getAs[String]("event_type"))
    rows.foreach { r =>
      val xs = hourly(r.getAs[String]("event_type")).map(_.getAs[Long]("count"))
      val n = xs.length.toLong; val t = xs.sum; val sxx = xs.map(x => x * x).sum
      assert(r.getAs[Long]("n_hours") == n)
      assert(r.getAs[Long]("dispersion_milli") == (n * sxx - t * t) * 1000 / ((n - 1) * t))
    }
  }

  test("q_policy_replay: IPS identity — full match would equal 5x the matched mass") {
    val row = run("q_policy_replay").head
    val n = row.getAs[Long]("n")
    assert(n == graft.core.Tables.events(spark, TestSpark.Sf0001).count())
    val mp = row.getAs[Long]("match_ppm")
    // a 1-of-5 deterministic policy matches roughly 1/5 of uniform logs
    assert(mp > 50000L && mp < 400000L, s"match_ppm $mp implausible for 1-of-5")
    assert(row.getAs[Long]("ips_value_milli") >= 0L)
    assert(row.getAs[Long]("logged_value_milli") >= 0L)
  }

  test("q_theil_sen: median of pairwise slopes recomputes exactly") {
    val row = run("q_theil_sen").head
    val daily = graft.core.Tables.events(spark, TestSpark.Sf0001)
      .groupBy(to_date(col("ts")).as("day"))
      .agg(expr("CAST(sum(CAST(round(value * 1000) AS BIGINT)) AS BIGINT)").as("y"))
      .selectExpr("CAST(datediff(day, DATE '1970-01-01') AS BIGINT) AS d", "y")
      .collect().map(r => (r.getAs[Long]("d"), r.getAs[Long]("y"))).sortBy(_._1)
    val slopes = (for {
      i <- daily.indices; j <- (i + 1) until daily.length
    } yield (daily(j)._2 - daily(i)._2) * 1000 / (daily(j)._1 - daily(i)._1)).sorted
    assert(row.getAs[Long]("n_pairs") == slopes.length.toLong)
    // type-7 median on the k/2 grid, floored
    val n = slopes.length
    val med: Double =
      if (n % 2 == 1) slopes(n / 2).toDouble
      else (slopes(n / 2 - 1) + slopes(n / 2)) / 2.0
    assert(row.getAs[Long]("sen_slope_milli") == math.floor(med).toLong)
    assert(row.getAs[Long]("n_days") == daily.length.toLong)
  }
}
