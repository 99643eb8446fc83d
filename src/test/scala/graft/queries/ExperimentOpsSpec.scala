package graft.queries

import org.apache.spark.sql.Row
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
}
