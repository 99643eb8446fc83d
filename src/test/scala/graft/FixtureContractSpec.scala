package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.core.Tables

/** Pins the fixture invariants the oracle surface RELIES on, so a driver
  * fixture regeneration that breaks one (the round-6 event: events.ts
  * changed parquet type mid-round) fails here with a reason instead of as
  * scattered hash-reds. Each test names the consumers of its invariant.
  */
class FixtureContractSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = TestSpark.Sf0001

  test("prices are exact 2-decimal values (integer-cents consumers: decimal_exact, histogram, percentile rounding)") {
    val bad = Tables.orders(spark, dir)
      .filter(abs(col("o_totalprice") * 100 - round(col("o_totalprice") * 100)) > 1e-6)
      .count()
    val badL = Tables.lineitem(spark, dir)
      .filter(abs(col("l_extendedprice") * 100 - round(col("l_extendedprice") * 100)) > 1e-6)
      .count()
    assert(bad == 0 && badL == 0, "prices are no longer 2-decimal — integer-cents oracles break")
  }

  test("documents.text is printable ASCII without newlines (consumers: blob oracles' ord(substr)==byte, q_scan_text round trip)") {
    val bad = Tables.documents(spark, dir)
      .filter(!col("text").rlike("^[ -~]*$")).count()
    assert(bad == 0, "documents.text has non-ASCII or control chars — blob/text-roundtrip oracles break")
  }

  test("event ids are unique (consumers: q_sequence_gaps census, stream dedup oracle)") {
    val e = Tables.events(spark, dir)
    assert(e.count() == e.select("event_id").distinct().count())
  }

  test("events.ts loads as a timestamp at micro precision in UTC (consumers: every window/stream query)") {
    val t = Tables.events(spark, dir).schema("ts").dataType
    assert(t == org.apache.spark.sql.types.TimestampType,
      s"Tables.events ts contract changed: $t")
  }

  test("embeddings are fixed-width 64-dim vectors (consumers: PQ subspaces, hyperplane LSH, Lloyd)") {
    val dims = Tables.embeddings(spark, dir)
      .select(size(col("embedding")).as("d")).distinct().collect().map(_.getInt(0))
    assert(dims.toSeq == Seq(64), s"embedding dims changed: ${dims.mkString(",")}")
  }
}
