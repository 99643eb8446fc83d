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
}
