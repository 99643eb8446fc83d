package graft.queries

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{SparkEntry, TestSpark}

/** Semantic invariants of the round-8 series operators (q_bollinger,
  * q_peak_detect, q_interpolate_linear). */
class SeriesOpsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private def run(name: String): Array[Row] =
    SparkEntry.queries(name)(spark, TestSpark.Sf0001).collect()

  test("q_bollinger: breaches bounded by eligible hours, both sides rare under 2-sigma") {
    val rows = run("q_bollinger")
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (h, a, b) = (r.getAs[Long]("n_hours"), r.getAs[Long]("n_above"),
        r.getAs[Long]("n_below"))
      assert(a >= 0 && b >= 0 && a + b <= h)
      // Chebyshev: at most 1/4 of points sit beyond 2 sigma of ANY
      // distribution — the census cannot exceed that on a same-window test
      assert(4 * (a + b) <= h + 3,
        s"${r.getAs[String]("event_type")}: ${a + b} breaches of $h hours")
    }
  }

  test("q_peak_detect: peak count bounded by alternation; top peak above mean") {
    val rows = run("q_peak_detect")
    rows.foreach { r =>
      val (h, p) = (r.getAs[Long]("n_hours"), r.getAs[Long]("n_peaks"))
      // strict local maxima can occupy at most every other interior point
      assert(p <= (h - 1) / 2 + 1, s"$p peaks in $h hours")
      if (p > 0) assert(r.getAs[Long]("top_peak_n") >= 1L)
    }
  }

  test("q_interpolate_linear: observed hours untouched, lerp between neighbors, monotone between endpoints") {
    val rows = run("q_interpolate_linear")
    val byUser = rows.groupBy(_.getAs[Long]("user_id"))
    // endpoints of every user spine are observed
    byUser.foreach { case (_, rs) =>
      val sorted = rs.sortBy(_.getAs[Long]("hi"))
      assert(sorted.head.getAs[String]("src") == "obs")
      assert(sorted.last.getAs[String]("src") == "obs")
      // spine is contiguous
      val his = sorted.map(_.getAs[Long]("hi"))
      assert(his.zip(his.tail).forall { case (x, y) => y == x + 1 })
      // every lerp value sits within [min, max] of the flanking obs values
      var prevObs = sorted.head.getAs[Long]("v_micro")
      var pending = List.empty[Long]
      sorted.tail.foreach { r =>
        if (r.getAs[String]("src") == "obs") {
          val nextObs = r.getAs[Long]("v_micro")
          val (lo, hi) = (math.min(prevObs, nextObs), math.max(prevObs, nextObs))
          pending.foreach(v => assert(v >= lo && v <= hi, s"lerp $v outside [$lo,$hi]"))
          pending = Nil; prevObs = nextObs
        } else pending ::= r.getAs[Long]("v_micro")
      }
      assert(pending.isEmpty) // no trailing lerp after the last obs
    }
    // the observed values agree with the raw last-value-in-hour
    val obsCount = rows.count(_.getAs[String]("src") == "obs")
    val direct = graft.core.Tables.events(spark, TestSpark.Sf0001)
      .select(col("user_id"), expr("unix_micros(ts) DIV 3600000000").as("hi"))
      .distinct().count()
    assert(obsCount == direct)
  }

  test("q_holt_forecast: driver-side exact replay of the integer recursion") {
    val rows = run("q_holt_forecast")
    val daily = graft.core.Tables.events(spark, TestSpark.Sf0001)
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("x"))
      .orderBy("event_type", "day").collect()
      .groupBy(_.getAs[String]("event_type"))
    rows.foreach { r =>
      val t = r.getAs[String]("event_type")
      val xs = daily(t).sortBy(_.getAs[java.sql.Date]("day").toString)
        .map(_.getAs[Long]("x"))
      var l = xs.head; var b = 0L; var sae = 0L
      xs.tail.foreach { x =>
        sae += math.abs(x - (l + b))
        val l2 = (x + l + b) / 2 // JVM / on Long truncates toward zero, like DIV
        b = (l2 - l + b) / 2
        l = l2
      }
      assert(r.getAs[Long]("level") == l, s"$t level")
      assert(r.getAs[Long]("trend") == b, s"$t trend")
      assert(r.getAs[Long]("forecast_next") == l + b)
      assert(r.getAs[Long]("n_days") == xs.length.toLong)
      if (xs.length > 1) assert(r.getAs[Long]("mae_milli") == sae * 1000 / (xs.length - 1))
    }
  }

  test("q_top_paths: 5 rows of 3-step paths over the type alphabet, shares consistent") {
    val rows = run("q_top_paths")
    assert(rows.length == 5)
    val types = Set("click", "error", "purchase", "signup", "view")
    rows.foreach { r =>
      val segs = r.getAs[String]("path").split(">")
      assert(segs.length == 3 && segs.forall(types.contains), r.getAs[String]("path"))
      assert(r.getAs[Long]("n_users") > 0)
      assert(r.getAs[Long]("share_ppm") <= 1000000L)
    }
    val counts = rows.map(_.getAs[Long]("n_users"))
    assert(counts.zip(counts.tail).forall { case (a, b) => a >= b })
  }

  test("q_new_vs_returning: day-1 users are all new; masses conserve") {
    val rows = run("q_new_vs_returning").sortBy(_.getAs[Long]("day"))
    assert(rows.nonEmpty)
    val first = rows.head
    assert(first.getAs[Long]("n_new") == first.getAs[Long]("dau"),
      "every user on the first day is new")
    assert(first.getAs[Long]("new_ppm") == 1000000L)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_new") + r.getAs[Long]("n_returning") ==
        r.getAs[Long]("dau"))
    }
    // total new users across days = total distinct users
    val users = graft.core.Tables.events(spark, TestSpark.Sf0001)
      .select("user_id").distinct().count()
    assert(rows.map(_.getAs[Long]("n_new")).sum == users)
  }

  test("q_holt_winters: driver-side exact replay of the triple recursion") {
    val rows = run("q_holt_winters")
    val daily = graft.core.Tables.events(spark, TestSpark.Sf0001)
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("x"))
      .selectExpr("event_type", "day",
        "CAST((datediff(day, DATE '1970-01-01') + 4) % 7 AS INT) AS dow", "x")
      .orderBy("event_type", "day").collect()
      .groupBy(_.getAs[String]("event_type"))
    rows.foreach { r =>
      val t = r.getAs[String]("event_type")
      val series = daily(t).sortBy(_.getAs[java.sql.Date]("day").toString)
        .map(rr => (rr.getAs[Int]("dow"), rr.getAs[Long]("x")))
      var l = series.head._2; var b = 0L
      val sea = Array.fill(7)(0L); var sae = 0L
      series.tail.foreach { case (dow, x) =>
        sae += math.abs(x - (l + b + sea(dow)))
        val lp = (x - sea(dow) + l + b) / 2
        b = (lp - l + b) / 2
        sea(dow) = (x - lp + sea(dow)) / 2
        l = lp
      }
      assert(r.getAs[Long]("level") == l, s"$t level")
      assert(r.getAs[Long]("trend") == b, s"$t trend")
      (0 until 7).foreach(j =>
        assert(r.getAs[Long](s"sea$j") == sea(j), s"$t sea$j"))
      if (series.length > 1)
        assert(r.getAs[Long]("mae_milli") == sae * 1000 / (series.length - 1))
    }
  }

  test("q_timeseries_cv: every fold is leak-free with growing train mass") {
    val rows = run("q_timeseries_cv").sortBy(_.getAs[Long]("fold"))
    assert(rows.length == 4)
    rows.foreach { r =>
      assert(r.getAs[Long]("no_leakage") == 1L, s"fold ${r.getAs[Long]("fold")} leaks")
      assert(r.getAs[Long]("n_train") > 0 && r.getAs[Long]("n_test") > 0)
      assert(r.getAs[Long]("max_train_d") < r.getAs[Long]("min_test_d"))
    }
    val train = rows.map(_.getAs[Long]("n_train"))
    assert(train.zip(train.tail).forall { case (a, b) => a <= b },
      "expanding window must not shrink")
  }

  test("q_drawdown: drawdown identities against a driver-side replay") {
    val r = run("q_drawdown").head
    val daily = graft.core.Tables.events(spark, TestSpark.Sf0001)
      .groupBy(expr("CAST(datediff(to_date(ts), DATE '1970-01-01') AS BIGINT)").as("d"))
      .agg(expr("CAST(sum(CAST(round(value * 1000) AS BIGINT)) AS BIGINT)").as("v"))
      .orderBy("d").collect().map(x => (x.getAs[Long]("d"), x.getAs[Long]("v")))
    var cum = 0L; var peak = 0L
    var best = (Long.MinValue, Long.MinValue, 0L) // (dd, -day, peak)
    daily.foreach { case (d, v) =>
      cum += v; peak = math.max(peak, cum)
      val dd = peak - cum
      if (dd > best._1 || (dd == best._1 && -d > best._2)) best = (dd, -d, peak)
    }
    assert(r.getAs[Long]("n_days") == daily.length.toLong)
    assert(r.getAs[Long]("final_cum_milli") == cum)
    assert(r.getAs[Long]("max_drawdown_milli") == best._1)
    assert(r.getAs[Long]("trough_day") == -best._2)
  }

  test("q_changepoint_binseg: level-2 splits nest inside level 1; masses conserve") {
    val rows = run("q_changepoint_binseg")
    val byType = rows.groupBy(_.getAs[String]("event_type"))
    byType.foreach { case (t, rs) =>
      val full = rs.find(_.getAs[String]("segment") == "FULL").get
      val l = rs.find(_.getAs[String]("segment") == "L")
      val r = rs.find(_.getAs[String]("segment") == "R")
      // L + R partition the full index range
      for (lr <- l; rr <- r) {
        assert(lr.getAs[Long]("n_seg") + rr.getAs[Long]("n_seg") ==
          full.getAs[Long]("n_seg"), s"$t: segment masses")
        // the left cp precedes the level-1 cp, which precedes the right cp
        assert(lr.getAs[Long]("cp_hi") <= full.getAs[Long]("cp_hi"))
        assert(rr.getAs[Long]("cp_hi") > full.getAs[Long]("cp_hi"))
      }
      assert(full.getAs[Long]("scaled_cusum") >= 0L)
    }
  }

  test("q_concurrency: delta conservation and a driver-side sweep-line replay") {
    val rows = run("q_concurrency").sortBy(_.getAs[Long]("hour"))
    assert(rows.nonEmpty)
    // independent replay: global sweep line over the same session intervals
    val ev = graft.core.Tables.events(spark, TestSpark.Sf0001)
      .selectExpr("user_id", "event_id", "unix_micros(ts) AS t")
      .collect().map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("event_id"),
        r.getAs[Long]("t")))
    val deltas = ev.groupBy(_._1).values.flatMap { es =>
      val ts = es.sortBy(e => (e._3, e._2)).map(_._3)
      val sessions = ts.foldLeft(List.empty[(Long, Long)]) {
        case (Nil, t) => List((t, t))
        case ((s, e) :: tail, t) =>
          if (t - e > 30L * 60 * 1000000L) (t, t) :: (s, e) :: tail
          else (s, t) :: tail
      }
      sessions.flatMap { case (s, e) => Seq((s, 1L), (e + 1, -1L)) }
    }.toSeq.sortBy { case (t, d) => (t, -d) }
    var cur = 0L
    val peakByHour = scala.collection.mutable.Map.empty[Long, Long]
    deltas.foreach { case (t, d) =>
      val h = t / 3600000000L
      // boundary value before the hour's first delta is a peak candidate
      peakByHour.updateWith(h)(v => Some(math.max(v.getOrElse(cur), cur + d)))
      cur += d
    }
    assert(cur == 0L, "every session must close")
    rows.foreach { r =>
      val h = r.getAs[Long]("hour")
      assert(r.getAs[Long]("peak_concurrency") == peakByHour(h),
        s"hour $h: ${r.getAs[Long]("peak_concurrency")} vs ${peakByHour(h)}")
    }
  }

  test("q_median_polish: residuals shrink and row effects track the row medians") {
    val rows = run("q_median_polish")
    assert(rows.nonEmpty)
    rows.foreach { r =>
      // after two polish sweeps the median absolute residual per row is
      // no larger than the max — and the decomposition's whole point is
      // residuals far below the row effect scale on a seasonal grid
      val med = r.getAs[Long]("med_abs_resid_milli")
      val mx = r.getAs[Long]("max_abs_resid_milli")
      assert(med >= 0L && med <= mx)
      assert(r.getAs[Long]("n_cells") > 0L && r.getAs[Long]("n_cells") <= 168L)
    }
  }

  test("q_cohort_ltv: cumulative revenue monotone; LTV division exact") {
    val rows = run("q_cohort_ltv")
    assert(rows.nonEmpty)
    rows.groupBy(_.getAs[Long]("cohort_d")).foreach { case (_, rs) =>
      val sorted = rs.sortBy(_.getAs[Long]("age"))
      val cum = sorted.map(_.getAs[Long]("cum_rev_milli"))
      assert(cum.zip(cum.tail).forall { case (a, b) => a <= b })
      // cum is the running sum of the per-age revenue
      assert(cum.last == sorted.map(_.getAs[Long]("rev_milli")).sum)
      sorted.foreach { r =>
        assert(r.getAs[Long]("ltv_milli") ==
          r.getAs[Long]("cum_rev_milli") / r.getAs[Long]("n_users"))
      }
    }
  }

  test("q_time_to_convert: percentile ordering and converter bound") {
    val r = run("q_time_to_convert").head
    val n = r.getAs[Long]("n_converters")
    assert(n > 0)
    assert(n <= graft.core.Tables.events(spark, TestSpark.Sf0001)
      .select("user_id").distinct().count())
    assert(r.getAs[Long]("p50_min") <= r.getAs[Long]("p90_min"))
    assert(r.getAs[Long]("p90_min") <= r.getAs[Long]("max_min"))
    assert(r.getAs[Long]("p50_min") >= 0L)
  }

  test("q_dau_overlap: set identities — both <= min(dau, dau_next), rates consistent") {
    val rows = run("q_dau_overlap")
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (a, b, both) = (r.getAs[Long]("dau"), r.getAs[Long]("dau_next"),
        r.getAs[Long]("n_both"))
      assert(both <= math.min(a, b))
      assert(r.getAs[Long]("jaccard_ppm") == both * 1000000L / (a + b - both))
      assert(r.getAs[Long]("return_ppm") == both * 1000000L / a)
    }
  }

  test("q_seasonal_strength: eta2 in [0, 1e6], peak hour in the week grid") {
    val rows = run("q_seasonal_strength")
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val eta = r.getAs[Long]("eta2_ppm")
      // eta² is a variance share: the integer flooring can push the
      // numerator a hair below 0 but never above the denominator
      assert(eta >= -1L && eta <= 1000000L, s"eta2_ppm $eta outside [0, 1e6]")
      val p = r.getAs[Long]("peak_how")
      assert(p >= 0L && p < 168L, s"peak_how $p outside the week grid")
    }
  }

  test("q_islands: streak arithmetic recomputes from the raw day sets") {
    val rows = run("q_islands")
    assert(rows.nonEmpty)
    val days = graft.core.Tables.events(spark, TestSpark.Sf0001)
      .selectExpr("user_id", "CAST(datediff(to_date(ts), DATE '1970-01-01') AS BIGINT) AS d")
      .distinct().collect()
      .groupBy(_.getAs[Long]("user_id"))
      .view.mapValues(_.map(_.getAs[Long]("d")).sorted.toSeq).toMap
    rows.foreach { r =>
      val ds = days(r.getAs[Long]("user_id"))
      // islands = runs of consecutive days
      val runs = ds.foldLeft(List.empty[(Long, Long)]) { // (start, len)
        case (acc, d) => acc match {
          case (s, l) :: tail if s + l == d => (s, l + 1) :: tail
          case _ => (d, 1L) :: acc
        }
      }.reverse
      assert(r.getAs[Long]("n_islands") == runs.length.toLong)
      assert(r.getAs[Long]("longest_streak") == runs.map(_._2).max)
      assert(r.getAs[Long]("n_active_days") == ds.length.toLong)
      val best = runs.maxBy { case (s, l) => (l, -s) }
      assert(r.getAs[Long]("best_start_d") == best._1)
    }
  }

  test("q_freshness: the freshest type has lag 0; verdicts follow the SLA rule") {
    val rows = run("q_freshness")
    assert(rows.nonEmpty)
    assert(rows.exists(_.getAs[Long]("lag_min") == 0L))
    rows.foreach { r =>
      val lag = r.getAs[Long]("lag_min")
      assert(lag >= 0L)
      assert(r.getAs[Long]("is_fresh") == (if (lag <= 120L) 1L else 0L))
      assert(r.getAs[Long]("n_events") > 0L)
    }
  }

  test("q_stream_quantile: sketch is a lower bound within the octave error band") {
    val rows = run("q_stream_quantile")
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val est = r.getAs[Long]("est_milli"); val ex = r.getAs[Long]("exact_milli")
      // the estimate is the containing bucket's LOWER edge: est <= exact,
      // and a value v >= 8·(bucket width) bounds the relative gap at 2^-3
      // (sub-bucket index >= 8 within its octave), plus the DIV-16 floor
      assert(est <= ex, s"est $est > exact $ex")
      val err = r.getAs[Long]("err_ppm")
      assert(err >= 0L && err <= 125100L, s"err_ppm $err outside the octave band")
    }
  }

  test("q_qq_points: nine probes, quantiles monotone in p on both sides") {
    val rows = run("q_qq_points").sortBy(_.getAs[Long]("p_pct"))
    assert(rows.map(_.getAs[Long]("p_pct")).toSeq == (1 to 9).map(_ * 10L))
    def mono(c: String) = {
      val v = rows.map(_.getAs[Long](c))
      v.zip(v.tail).forall { case (a, b) => a <= b }
    }
    assert(mono("q_purchase_milli") && mono("q_click_milli"))
    rows.foreach(r => assert(r.getAs[Long]("gap_milli") ==
      r.getAs[Long]("q_purchase_milli") - r.getAs[Long]("q_click_milli")))
  }
}
