package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.{SparkEntry, TestSpark}
import graft.core.Tables

/** Invariants of the derived-column TPC-H remainder (TpchDerived): the
  * synthetic partsupp is a well-formed dimension, the derived lineitem
  * columns respect their documented ranges, and the queries' structural
  * claims hold. Value-level cross-engine equality is the oracle gate's
  * job; these pin the DERIVATION's contract.
  */
class TpchDerivedSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("derived partsupp: exactly 4 distinct in-range suppliers per part, costs in [100, 100000)") {
    Tables.part(spark, TestSpark.Sf0001).createOrReplaceTempView("part_v")
    Tables.supplier(spark, TestSpark.Sf0001).createOrReplaceTempView("supplier_v")
    val ps = spark.sql(
      """SELECT p_partkey AS ps_partkey,
        |       (p_partkey * 4 + j) % ns AS ps_suppkey,
        |       1 + (p_partkey * 7 + j * 131) % 9999 AS ps_availqty,
        |       100 + (p_partkey * 13 + j * 17) % 99900 AS ps_supplycost_cents
        |FROM part_v
        |CROSS JOIN (SELECT count(*) AS ns FROM supplier_v)
        |CROSS JOIN (SELECT explode(sequence(0, 3)) AS j)""".stripMargin)
    val nPart = Tables.part(spark, TestSpark.Sf0001).count()
    val nSupp = Tables.supplier(spark, TestSpark.Sf0001).count()
    assert(ps.count() == 4 * nPart)
    val perPart = ps.groupBy("ps_partkey")
      .agg(countDistinct("ps_suppkey").as("n")).agg(min("n"), max("n")).head()
    assert(perPart.getLong(0) == 4 && perPart.getLong(1) == 4,
      "the 4 consecutive-int supplier keys must stay distinct mod |supplier|")
    val r = ps.agg(min("ps_suppkey"), max("ps_suppkey"),
      min("ps_availqty"), max("ps_availqty"),
      min("ps_supplycost_cents"), max("ps_supplycost_cents")).head()
    assert(r.getLong(0) >= 0 && r.getLong(1) < nSupp, "ps_suppkey joins supplier")
    assert(r.getLong(2) >= 1 && r.getLong(3) <= 9999)
    assert(r.getLong(4) >= 100 && r.getLong(5) < 100000)
  }

  test("q_sql_tpch_q12: only MAIL/SHIP modes survive; line counts partition each mode's rows") {
    val rows = SparkEntry.queries("q_sql_tpch_q12")(spark, TestSpark.Sf0001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(Set("MAIL", "SHIP").contains(r.getString(0)))
      assert(r.getLong(1) >= 0 && r.getLong(2) >= 0 && r.getLong(1) + r.getLong(2) > 0)
    }
  }

  test("q_sql_tpch_q11: every reported nation clears the integer concentration bar") {
    val rows = SparkEntry.queries("q_sql_tpch_q11")(spark, TestSpark.Sf0001)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(rows.nonEmpty)
    // recompute the global total independently (4 rows per part, same affine hash)
    Tables.part(spark, TestSpark.Sf0001).createOrReplaceTempView("part_v")
    Tables.supplier(spark, TestSpark.Sf0001).createOrReplaceTempView("supplier_v")
    val total = spark.sql(
      """SELECT CAST(sum((1 + (p_partkey * 7 + j * 131) % 9999)
        |                * (100 + (p_partkey * 13 + j * 17) % 99900)) AS BIGINT) AS t
        |FROM part_v CROSS JOIN (SELECT explode(sequence(0, 3)) AS j)""".stripMargin)
      .head().getLong(0)
    rows.foreach { case (n, v) =>
      assert(v * 50 > total, s"$n reported with value $v not above total/50 of $total")
    }
    assert(rows.map(-_._2).toSeq == rows.map(-_._2).sorted.toSeq, "value-descending order")
  }

  test("q_sql_tpch_q2 plans the min-cost subquery decorrelated (no per-row re-execution)") {
    val p = SparkEntry.queries("q_sql_tpch_q2")(spark, TestSpark.Sf0001)
      .queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin"), s"dims must broadcast:\n$p")
    assert(!p.toLowerCase.contains("cartesianproduct"),
      s"correlated min must decorrelate, not re-execute per row:\n$p")
  }

  test("q_sql_tpch_q21 decorrelates EXISTS/NOT EXISTS into semi + anti joins") {
    val plan = SparkEntry.queries("q_sql_tpch_q21")(spark, TestSpark.Sf0001)
      .queryExecution.optimizedPlan.toString
    assert(plan.contains("LeftSemi"), s"EXISTS not planned as semi join:\n$plan")
    assert(plan.contains("LeftAnti"), s"NOT EXISTS not planned as anti join:\n$plan")
  }
}
