package graft.sim

import org.apache.spark.sql.Row
import org.scalatest.funsuite.AnyFunSuite

import graft.{SparkEntry, TestSpark}

/** Semantic invariants of the grid-bucketed spatial operators
  * (q_dbscan_core, q_grid_density) — chiefly that the 3x3 cell join is
  * COMPLETE for eps-neighborhoods (cell size = eps, so any pair within
  * eps differs by at most one cell per axis) and the role partition is
  * exhaustive and disjoint.
  */
class SpatialOpsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private def run(name: String): Array[Row] =
    SparkEntry.queries(name)(spark, TestSpark.Sf0001).collect()

  test("q_dbscan_core: roles partition every point; grid join is neighborhood-complete") {
    val rows = run("q_dbscan_core")
    rows.foreach { r =>
      assert(r.getAs[Long]("n_core") + r.getAs[Long]("n_border") +
        r.getAs[Long]("n_noise") == r.getAs[Long]("n_pts"))
    }
    val total = rows.map(_.getAs[Long]("n_pts")).sum
    val nVec = graft.core.Tables.embeddings(spark, TestSpark.Sf0001).count()
    assert(total == nVec)
    // brute-force cross-check of the neighbor census on the tiny fixture:
    // max_nbrs must match an all-pairs count (completeness of the 3x3 join)
    import spark.implicits._
    val pts = graft.core.Tables.embeddings(spark, TestSpark.Sf0001)
      .selectExpr("vec_id",
        "CAST(round(element_at(embedding, 1) * 1000000) AS BIGINT) + 1000000 AS xi",
        "CAST(round(element_at(embedding, 2) * 1000000) AS BIGINT) + 1000000 AS yi")
      .as[(Long, Long, Long)].collect()
    val eps2 = 50000L * 50000L
    val brute = pts.map { case (_, x, y) =>
      pts.count { case (_, bx, by) =>
        (x - bx) * (x - bx) + (y - by) * (y - by) <= eps2 } - 1L
    }.max
    assert(rows.map(_.getAs[Long]("max_nbrs")).max == brute)
  }

  test("q_grid_density: shares bounded, ranks strict, cells hold all points") {
    val rows = run("q_grid_density").sortBy(_.getAs[Int]("rk"))
    assert(rows.length == 10)
    val ns = rows.map(_.getAs[Long]("n"))
    assert(ns.zip(ns.tail).forall { case (a, b) => a >= b })
    assert(rows.map(_.getAs[Long]("share_ppm")).sum <= 1000000L)
    assert(rows.head.getAs[Long]("n_cells") >= 10L)
  }
}
