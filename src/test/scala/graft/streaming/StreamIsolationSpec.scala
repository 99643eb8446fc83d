package graft.streaming

import java.io.File

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** r13 streaming-floor guardrails: every drained streaming run gets its OWN
  * scratch checkpoint (no state store is ever shared across queries) and
  * the scratch dir is deleted after the drain — so the tmpfs/temp-dir
  * checkpoint relocation cannot leak state BETWEEN queries or ACROSS runs
  * (the no-precomputation rule: a leftover state store would be a cached
  * intermediate keyed on the fixture).
  */
class StreamIsolationSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("back-to-back drains share no state and clean their scratch checkpoints") {
    val ss = Streams.streamingSession(spark)
    val base = new File(Streams.ckptBase(ss))
    val before = Option(base.list()).map(_.toSet).getOrElse(Set.empty[String])

    val r1 = Streams.runToBatch(ss,
      Streams.tumblingCounts(Streams.readEvents(ss, TestSpark.Sf0001))).collect()
    val r2 = Streams.runToBatch(ss,
      Streams.tumblingCounts(Streams.readEvents(ss, TestSpark.Sf0001))).collect()

    // identical re-run: leaked state (a reused store) would double the
    // counts of the second drain in Complete mode
    assert(r1.map(_.toString).sorted.toSeq == r2.map(_.toString).sorted.toSeq)
    assert(r1.nonEmpty)

    // every per-query scratch checkpoint dir was deleted after its drain
    val after = Option(base.list()).map(_.toSet).getOrElse(Set.empty[String])
    assert((after -- before).isEmpty,
      s"leftover scratch checkpoints: ${(after -- before).mkString(", ")}")
  }

  test("scratch checkpoint is cleaned even when a drain fails") {
    val ss = Streams.streamingSession(spark)
    val base = new File(Streams.ckptBase(ss))
    val before = Option(base.list()).map(_.toSet).getOrElse(Set.empty[String])
    // Append mode on an unwatermarked streaming aggregate is rejected at
    // start(): the scratch cleanup must still run
    intercept[Exception] {
      Streams.runToBatch(ss,
        Streams.readEvents(ss, TestSpark.Sf0001).groupBy("event_type").count(),
        org.apache.spark.sql.streaming.OutputMode.Append())
    }
    val after = Option(base.list()).map(_.toSet).getOrElse(Set.empty[String])
    assert((after -- before).isEmpty)
  }
}
