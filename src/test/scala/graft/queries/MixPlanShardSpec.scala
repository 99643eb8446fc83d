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
    def f(r: org.apache.spark.sql.Row, c: String) = r.getLong(r.fieldIndex(c))
    assert(shards.map(f(_, "shard_bytes")).sum == totalBytes)
    // greedy packing invariant: a shard only exceeds the target by less
    // than one blob (the blob that crossed the boundary)
    shards.foreach { r =>
      assert(f(r, "shard_bytes") < graft.multimodal.BlobQueries.ShardBytes + maxBlob)
    }
    // per-scope bound: no (kind, pack_group) window partition ever holds
    // more than PackGroupDocs blobs — the 100x guard this query exists for
    shards.groupBy(r => (r.getString(0), f(r, "pack_group"))).foreach {
      case (scope, rs) =>
        assert(rs.map(f(_, "n_blobs")).sum <= graft.multimodal.BlobQueries.PackGroupDocs,
          s"scope $scope packs more docs than PackGroupDocs")
    }
    // shards are contiguous, non-overlapping doc ranges WITHIN their scope
    // (shard ids repeat across kinds/groups, so sort by the full scope key)
    shards.groupBy(r => (r.getString(0), f(r, "pack_group"))).foreach {
      case (_, rs) =>
        rs.sortBy(f(_, "shard_id")).sliding(2).foreach {
          case Array(a, b) => assert(f(a, "last_doc") < f(b, "first_doc"))
          case _ =>
        }
    }
  }

  test("blob shards: planted multi-group corpus packs each scope independently") {
    import spark.implicits._
    // 10 docs of 100 bytes across 2 pack groups (groupDocs = 5) with a
    // 250-byte shard target: each group must pack its own shards from a
    // zero running sum — 3 shards per group (250+250+... pattern), never a
    // running sum carried across groups.
    val blobs = (0L until 10L).map(i => (i, "img", 100L)).toDF("doc_id", "kind", "n_bytes")
    val m = graft.multimodal.BlobQueries.shardManifest(blobs, groupDocs = 5L, shardBytes = 250L)
      .collect()
    def f(r: org.apache.spark.sql.Row, c: String) = r.getLong(r.fieldIndex(c))
    assert(m.map(f(_, "pack_group")).distinct.sorted.toSeq == Seq(0L, 1L))
    // group 0 = docs 0..4 (500 bytes): shards 0 (docs 0-2) and 1 (docs 3-4);
    // group 1 = docs 5..9 identically — shard_id restarts at 0 per group
    Seq(0L, 1L).foreach { g =>
      val rs = m.filter(f(_, "pack_group") == g).sortBy(f(_, "shard_id"))
      assert(rs.map(f(_, "shard_id")).toSeq == Seq(0L, 1L), s"group $g shard ids")
      assert(rs.map(f(_, "n_blobs")).toSeq == Seq(3L, 2L), s"group $g blob counts")
      assert(f(rs.head, "first_doc") == g * 5)
    }
  }
}
