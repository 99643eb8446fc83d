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
