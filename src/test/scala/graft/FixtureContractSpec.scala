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

  test("events.ts ON-DISK unit is TIMESTAMP(MICROS) as TIMESTAMP_NTZ (regen #2 was NANOS→MICROS; consumers: Tables.normalizeEventTs arms, Streams.readEvents, DuckDB oracle CAST)") {
    // the RAW parquet type, before loader normalization: the known fixture
    // encodings are exactly the normalizeEventTs arms — native MICROS
    // (TIMESTAMP_NTZ; current, since the 2026-08-13 regen) or legacy NANOS
    // surfaced as LongType under NanosAsLongConf. Any third type means
    // regen #3 changed the unit: extend Tables.normalizeEventTs AND this
    // pin deliberately — do not let `case _` silently cast.
    val raw = Tables.eventsRead(spark, dir).schema("ts").dataType
    assert(raw == org.apache.spark.sql.types.TimestampNTZType ||
        raw == org.apache.spark.sql.types.LongType,
      s"events.ts on-disk type is $raw — a fixture regen changed the timestamp unit " +
        "(known: TIMESTAMP_NTZ = native MICROS, LongType = legacy NANOS via nanosAsLong)")
    // and the micro precision survives the loader: a NANOS fixture value
    // truncates to whole micros, a MICROS fixture is already whole micros —
    // either way unix_micros round-trips the loaded ts exactly
    val e = Tables.events(spark, dir)
      .select(unix_micros(col("ts")).as("us"))
      .filter(col("us").isNull).count()
    assert(e == 0, "loaded ts does not round-trip through unix_micros")
  }

  test("embeddings are fixed-width 64-dim vectors (consumers: PQ subspaces, hyperplane LSH, Lloyd)") {
    val dims = Tables.embeddings(spark, dir)
      .select(size(col("embedding")).as("d")).distinct().collect().map(_.getInt(0))
    assert(dims.toSeq == Seq(64), s"embedding dims changed: ${dims.mkString(",")}")
  }
}
