package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.{SparkEntry, TestSpark}

/** Properties of the time-series family the hash oracle can't express:
  * spine contiguity, interval algebra of the SCD-2 history, the
  * weighted-mean bound, and null placement of the error-safe arithmetic.
  */
class TimeSeriesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = TestSpark.Sf0001

  test("q_resample_1h: hour spine is contiguous per user and counts sum to the event total") {
    val rows = SparkEntry.queries("q_resample_1h")(spark, dir).collect()
    assert(rows.nonEmpty)
    val byUser = rows.groupBy(_.getLong(0))
    byUser.values.foreach { rs =>
      val hours = rs.map(_.getTimestamp(1).getTime).sorted
      hours.sliding(2).foreach { p =>
        if (p.length == 2) assert(p(1) - p(0) == 3600000L, "spine must step exactly 1 hour")
      }
      // once an observation exists, fill carries forward with no gaps
      val ordered = rs.sortBy(_.getTimestamp(1).getTime)
      val first = ordered.indexWhere(_.getLong(2) > 0)
      ordered.drop(first).foreach(r => assert(!r.isNullAt(3)))
    }
    val total = graft.core.Tables.events(spark, dir).count()
    assert(rows.map(_.getLong(2)).sum == total, "per-hour counts must partition the event stream")
  }

  test("q_scd2_history: versions are consecutive, intervals chain, exactly one current per user") {
    val rows = SparkEntry.queries("q_scd2_history")(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getLong(0)).values.foreach { rs =>
      val ordered = rs.sortBy(_.getLong(4))
      assert(ordered.map(_.getLong(4)).toSeq == (1L to ordered.length).toSeq)
      assert(ordered.count(_.getLong(5) == 1L) == 1, "exactly one open (current) version")
      ordered.sliding(2).foreach { p =>
        if (p.length == 2) {
          assert(!p(0).isNullAt(3) && p(0).getTimestamp(3) == p(1).getTimestamp(2),
            "valid_to must meet the next version's valid_from")
          assert(p(0).getString(1) != p(1).getString(1),
            "consecutive versions must differ in type")
        }
      }
    }
  }

  test("q_time_weighted_avg: twa lies within the user's value range, segments = events - 1") {
    val vals = graft.core.Tables.events(spark, dir)
      .groupBy("user_id").agg(min("value").as("lo"), max("value").as("hi"),
        count(lit(1)).as("n"))
      .collect().map(r => r.getLong(0) -> (r.getDouble(1), r.getDouble(2), r.getLong(3))).toMap
    val rows = SparkEntry.queries("q_time_weighted_avg")(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (lo, hi, n) = vals(r.getLong(0))
      assert(r.getLong(1) == n - 1)
      assert(r.getDouble(2) >= lo - 1e-6 && r.getDouble(2) <= hi + 1e-6,
        "a weighted mean cannot leave the convex hull of the values")
    }
  }

  test("q_try_arith: nulls appear exactly where the dirt was planted") {
    val rows = SparkEntry.queries("q_try_arith")(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val key = r.getLong(0)
      assert(r.isNullAt(2) == (key % 4 != 3), s"parsed must be null iff raw is dirty (key $key)")
      assert(r.isNullAt(3) == (key % 3 == 0), s"safe_ratio must be null iff divisor is 0 (key $key)")
    }
  }

  test("q_anomaly_seasonal: hour-of-week domain, integer verdict algebra") {
    val rows = SparkEntry.queries("q_anomaly_seasonal")(spark, dir).collect()
    assert(rows.nonEmpty && rows.length <= 168)
    rows.foreach { r =>
      val how = r.getAs[Long]("how")
      assert(how >= 0 && how < 168)
      val (nh, nf) = (r.getAs[Long]("n_hours"), r.getAs[Long]("n_flagged"))
      assert(nf <= nh)
      assert(r.getAs[Long]("flag_ppm") == nf * 1000000L / nh)
      // med2 = 2*median of positive hourly counts is >= 2
      assert(r.getAs[Long]("med2") >= 2)
    }
    // a cell at its own median is never flagged: |2n-2n|*100 > 50*med2 is
    // false, so at least one unflagged hour exists per cell with n_hours>=1
    assert(rows.exists(r => r.getAs[Long]("n_flagged") < r.getAs[Long]("n_hours")))
  }

  test("q_window_distinct: cumulative distinct closes to the true distinct count") {
    val rows = SparkEntry.queries("q_window_distinct")(spark, dir).collect()
    assert(rows.nonEmpty)
    val byType = rows.groupBy(_.getAs[String]("event_type"))
    val truth = graft.core.Tables.events(spark, dir)
      .groupBy("event_type")
      .agg(org.apache.spark.sql.functions.countDistinct("user_id").as("d"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    byType.foreach { case (t, rs) =>
      val sorted = rs.sortBy(_.getAs[Long]("day"))
      val cums = sorted.map(_.getAs[Long]("cum_users"))
      assert(cums.sameElements(cums.sorted), s"$t: cumulative not monotone")
      assert(cums.last == truth(t),
        s"$t: final cumulative ${cums.last} != true distinct ${truth(t)}")
      assert(sorted.map(_.getAs[Long]("new_users")).sum == cums.last)
    }
  }
}
