package graft.queries

import org.apache.spark.sql.Row
import org.scalatest.funsuite.AnyFunSuite

import graft.{SparkEntry, TestSpark}

/** Semantic invariants of the catalog-profiling operators (q_kmv_sketch,
  * q_pk_discovery, q_join_discovery). The byte-level cross-engine check is
  * the DuckDB oracle gate; these pin the KMV estimator against an exact
  * driver-side recomputation (including the merge), the key-discovery
  * verdict, and the sketch-vs-exact Jaccard agreement band.
  */
class ProfilingOpsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private def run(name: String): Array[Row] =
    SparkEntry.queries(name)(spark, TestSpark.Sf0001).collect()

  test("q_kmv_sketch: kth-min and estimate recompute exactly; merge = k-min of union") {
    val rows = run("q_kmv_sketch")
    val hashed = graft.core.Tables.orders(spark, TestSpark.Sf0001)
      .selectExpr("o_orderstatus AS grp",
        "CAST(conv(substring(md5(concat('kmv:', CAST(o_custkey AS STRING))), 1, 14), 16, 10) AS BIGINT) AS h")
      .distinct().collect()
      .map(r => (r.getAs[String]("grp"), r.getAs[Long]("h")))
    val byGrp = hashed.groupBy(_._1).map { case (g, v) => g -> v.map(_._2).distinct.sorted.toSeq }
    def expected(hs: Seq[Long]): (Long, Long, Long) = {
      val sk = hs.take(64)
      val est = if (sk.size < 64) sk.size.toLong
                else 63L * 72057594037927936L / sk.last
      (sk.last, sk.size.toLong, est)
    }
    // the merged sketch is the k smallest of the UNION OF THE SKETCHES —
    // which equals the k smallest of the union of the full sets
    val allSketch = byGrp.values.flatMap(_.take(64)).toSeq.distinct.sorted
    rows.foreach { r =>
      val grp = r.getAs[String]("grp")
      val hs = if (grp == "__ALL__") allSketch else byGrp(grp)
      val (kth, kUsed, est) = expected(hs)
      assert(r.getAs[Long]("kth_min") == kth, s"$grp kth_min")
      assert(r.getAs[Long]("k_used") == kUsed)
      assert(r.getAs[Long]("est") == est)
      // k = 64 keeps the estimator within ~±40% with overwhelming margin
      assert(math.abs(r.getAs[Long]("err_ppm")) < 400000L,
        s"$grp err_ppm ${r.getAs[Long]("err_ppm")}")
    }
  }

  test("q_pk_discovery: o_orderkey qualifies, low-cardinality columns don't") {
    val rows = run("q_pk_discovery")
    assert(rows.length == 6)
    val pks = rows.filter(_.getAs[Long]("is_pk") == 1L)
      .map(_.getAs[String]("column_name")).toSet
    // o_totalprice/o_orderdate may be incidentally unique at tiny scale;
    // only the true key and the true non-keys are scale-stable
    assert(pks.contains("o_orderkey"))
    assert(!pks.contains("o_orderstatus") && !pks.contains("o_orderpriority"))
    rows.foreach { r =>
      assert(r.getAs[Long]("n_distinct") <= r.getAs[Long]("n_rows"))
      assert(r.getAs[Long]("distinct_ppm") <= 1000000L)
    }
  }

  test("q_fd_check: the key FD holds, violating-key arithmetic consistent") {
    val rows = run("q_fd_check")
    assert(rows.length == 4)
    val byFd = rows.map(r => (r.getAs[String]("lhs"), r.getAs[String]("rhs")) -> r).toMap
    // a primary key determines every column
    assert(byFd(("o_orderkey", "o_custkey")).getAs[Long]("fd_holds") == 1L)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_pair") >= r.getAs[Long]("n_lhs"))
      assert(r.getAs[Long]("n_violating_keys") ==
        r.getAs[Long]("n_pair") - r.getAs[Long]("n_lhs"))
      assert(r.getAs[Long]("fd_holds") ==
        (if (r.getAs[Long]("n_violating_keys") == 0L) 1L else 0L))
    }
  }

  test("q_join_discovery: FK pairs flagged, sketch estimate tracks exact Jaccard") {
    val rows = run("q_join_discovery")
    assert(rows.length == 4)
    val byPair = rows.map(r =>
      (r.getAs[String]("col_a"), r.getAs[String]("col_b")) -> r).toMap
    // the three real FK relationships are join candidates
    for (p <- Seq(("o_custkey", "c_custkey"), ("l_partkey", "p_partkey"))) {
      assert(byPair(p).getAs[Long]("join_candidate") == 1L, s"$p not flagged")
    }
    // exact-Jaccard recall check lives HERE, at sf0.001 — the registered
    // query emits only the sketch + binomial error bound (the exact pair
    // join is fixture-scale work a catalog sweep must not pay at 100 TB)
    import graft.core.Tables
    def vals(colName: String): Set[Long] = {
      val (tbl, c) = colName match {
        case "o_orderkey" => (Tables.orders(spark, TestSpark.Sf0001), "o_orderkey")
        case "o_custkey"  => (Tables.orders(spark, TestSpark.Sf0001), "o_custkey")
        case "c_custkey"  => (Tables.customer(spark, TestSpark.Sf0001), "c_custkey")
        case "l_orderkey" => (Tables.lineitem(spark, TestSpark.Sf0001), "l_orderkey")
        case "l_partkey"  => (Tables.lineitem(spark, TestSpark.Sf0001), "l_partkey")
        case "p_partkey"  => (Tables.part(spark, TestSpark.Sf0001), "p_partkey")
      }
      tbl.selectExpr(s"CAST($c AS BIGINT) AS v").distinct().collect()
        .map(_.getAs[Long]("v")).toSet
    }
    rows.foreach { r =>
      val (a, b) = (r.getAs[String]("col_a"), r.getAs[String]("col_b"))
      val (sa, sb) = (vals(a), vals(b))
      val exactPpm = sa.intersect(sb).size.toLong * 1000000L / sa.union(sb).size
      // k = 128 bounds the KMV Jaccard deviation well inside 15 points
      val diff = math.abs(r.getAs[Long]("jaccard_est_ppm") - exactPpm)
      assert(diff <= 150000L, s"$a/$b: est ${r.getAs[Long]("jaccard_est_ppm")} vs exact $exactPpm")
      // the published error bound is sane: non-negative, < half a point of k=128
      val err = r.getAs[Long]("jaccard_err_ppm")
      assert(err >= 0L && err <= 1000000L / 22, s"$a/$b err bound $err")
    }
  }
}
