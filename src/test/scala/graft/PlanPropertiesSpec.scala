package graft

import org.scalatest.funsuite.AnyFunSuite

/** Executable form of SCALE.md's plan claims: if a future change regresses
  * pushdown, pruning, broadcast selection, top-k strategy, or partial
  * aggregation, these fail before any benchmark notices.
  */
class PlanPropertiesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def executedPlan(name: String): String =
    SparkEntry.queries(name)(spark, TestSpark.Sf0001)
      .queryExecution.executedPlan.toString

  test("q_filter_nonempty pushes predicates to the parquet scan and prunes columns") {
    val p = executedPlan("q_filter_nonempty")
    assert(p.contains("PushedFilters: [IsNotNull(l_quantity), IsNotNull(l_discount)") ||
      p.contains("GreaterThan(l_quantity,45.0)"), s"no pushdown:\n$p")
    assert(p.contains("ReadSchema: struct<l_orderkey:bigint,l_linenumber:int,l_quantity:double,l_discount:double>"),
      s"column pruning regressed:\n$p")
  }

  test("q_join_broadcast broadcasts both dims (no shuffle join)") {
    val p = executedPlan("q_join_broadcast")
    assert(p.contains("BroadcastHashJoin"), s"no BHJ:\n$p")
    assert(!p.contains("SortMergeJoin"), s"dim join fell back to SMJ:\n$p")
  }

  test("q_sort_limit compiles to TakeOrderedAndProject (no global sort)") {
    val p = executedPlan("q_sort_limit")
    assert(p.contains("TakeOrderedAndProject"), s"global sort leaked in:\n$p")
  }

  test("q_agg_stats uses partial (map-side) aggregation") {
    val p = executedPlan("q_agg_stats")
    assert(p.contains("partial_sum") || p.contains("partial_count"),
      s"no partial aggregation:\n$p")
  }

  test("q_assign_nearest has no shuffle before the (output-only) ordering") {
    val p = executedPlan("q_assign_nearest")
    // exactly one Exchange: the rangepartitioning for the deterministic
    // output orderBy; the assignment itself must not shuffle
    val exchanges = "Exchange".r.findAllIn(p).length
    assert(exchanges <= 2, s"assignment shuffles:\n$p") // range + optional AQE read
    assert(!p.contains("Exchange hashpartitioning"), s"assignment hash-shuffles:\n$p")
  }

  test("q_kmeans_iter1 shuffles only the exploded (cid, pos) aggregation keys") {
    val p = executedPlan("q_kmeans_iter1")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"assignment became a join:\n$p")
  }

  test("q_dedup_embed joins on the LSH bucket, never a cross product") {
    val p = executedPlan("q_dedup_embed")
    assert(!p.contains("CartesianProduct"), s"cross product leaked:\n$p")
  }

  test("every declared oracle key has a queries entry") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracle without query: $missing")
  }
}
