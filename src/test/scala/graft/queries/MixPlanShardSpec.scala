package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.TestSpark
import graft.core.Tables

/** Invariants for q_mix_plan, q_join_nullsafe, and q_blob_shard. */
class MixPlanShardSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("mix plan: rates in (0,1], planned tokens = min(available, target)") {
    val rows = DataPrepQueries.queries("q_mix_plan")(spark, TestSpark.Sf0001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (nTok, target, rate, planned) =
        (r.getLong(r.fieldIndex("n_tokens")), r.getLong(r.fieldIndex("target_tokens")),
          r.getDouble(r.fieldIndex("rate")), r.getLong(r.fieldIndex("planned_tokens")))
      assert(rate > 0.0 && rate <= 1.0)
      assert(planned == math.min(nTok, target))
    }
    // the plan never asks for more than the budget: sum(planned) <= total/2
    val total = rows.map(_.getLong(2)).sum
    assert(rows.map(_.getLong(5)).sum <= total / 2 + rows.length) // +n for per-source int-div slack
  }

  test("null-safe join: NULL key group present and pair counts multiply the censuses") {
    val rows = RelationalQueries.queries("q_join_nullsafe")(spark, TestSpark.Sf0001).collect()
    assert(rows.exists(_.isNullAt(0)), "NULL<=>NULL group missing")
    rows.foreach { r =>
      assert(r.getLong(1) * r.getLong(2) == r.getLong(3))
    }
    // independent recomputation of the null-group pair count
    val nl = Tables.orders(spark, TestSpark.Sf0001)
      .filter(pmod(col("o_custkey"), lit(10)) === 0).count()
    val nr = Tables.customer(spark, TestSpark.Sf0001)
      .filter(pmod(col("c_custkey"), lit(10)) === 0).count()
    val nullRow = rows.find(_.isNullAt(0)).get
    assert(nullRow.getLong(3) == nl * nr)
  }

  test("blob shards: bytes partition the corpus; no shard overfills past one blob") {
    val shards = graft.multimodal.BlobQueries.queries("q_blob_shard")(
      spark, TestSpark.Sf0001).collect()
    val blobs = graft.multimodal.BlobQueries.blobs(spark, TestSpark.Sf0001)
    val totalBytes = blobs.toDF().agg(sum("n_bytes")).head.getLong(0)
    val maxBlob = blobs.toDF().agg(max("n_bytes")).head.getLong(0)
    assert(shards.map(_.getLong(3)).sum == totalBytes)
    // greedy packing invariant: a shard only exceeds the target by less
    // than one blob (the blob that crossed the boundary)
    shards.foreach { r =>
      assert(r.getLong(3) < graft.multimodal.BlobQueries.ShardBytes + maxBlob)
    }
    // shards are contiguous, non-overlapping doc ranges
    val sorted = shards.sortBy(_.getLong(1))
    sorted.sliding(2).foreach {
      case Array(a, b) => assert(a.getLong(5) < b.getLong(4))
      case _ =>
    }
  }
}
