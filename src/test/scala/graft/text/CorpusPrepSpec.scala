package graft.text

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.{SparkEntry, TestSpark}

/** Properties of the corpus-prep family (q_text_normalize, q_sample_hash,
  * q_mix_sources, q_doc_idf, q_sessionize, q_ann_lsh) that the hash oracle
  * can't express: determinism under re-partitioning, statistical shape,
  * and containment relations.
  */
class CorpusPrepSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("q_sample_hash: split is exhaustive, disjoint, and ~80/10/10") {
    val rows = SparkEntry.queries("q_sample_hash")(spark, TestSpark.Sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    val n = rows.length.toDouble
    assert(n > 0)
    // every doc assigned exactly once (doc_ids unique in fixture)
    assert(rows.map(_._1).distinct.length == rows.length)
    val frac = rows.groupBy(_._3).view.mapValues(_.length / n).toMap
    // hash buckets are uniform-ish; 500 docs -> generous +-6pp tolerance
    assert(math.abs(frac.getOrElse("train", 0.0) - 0.80) < 0.06, s"train frac ${frac.get("train")}")
    assert(math.abs(frac.getOrElse("valid", 0.0) - 0.10) < 0.06, s"valid frac ${frac.get("valid")}")
    assert(math.abs(frac.getOrElse("test", 0.0) - 0.10) < 0.06, s"test frac ${frac.get("test")}")
    // bucket boundaries respected
    rows.foreach { case (_, b, s) =>
      val expect = if (b < 80) "train" else if (b < 90) "valid" else "test"
      assert(s == expect)
    }
  }

  test("hash split/mix assignment is invariant under repartitioning (retry-safe, unlike sample())") {
    val base = SparkEntry.queries("q_sample_hash")(spark, TestSpark.Sf0001)
    val shuffled = base.repartition(13).orderBy("doc_id")
    assert(base.collect().toSeq == shuffled.collect().toSeq)
  }

  test("q_mix_sources: per-source keep rate tracks the declared rate_pct") {
    val docs = graft.core.Tables.documents(spark, TestSpark.Sf0001)
      .groupBy("source").agg(count(lit(1)).as("n_total"))
    val kept = SparkEntry.queries("q_mix_sources")(spark, TestSpark.Sf0001)
      .groupBy("source").agg(count(lit(1)).as("n_kept"), first("rate_pct").as("rate_pct"))
    val joined = docs.join(kept, "source")
      .collect().map(r => (r.getAs[Long]("n_total"), r.getAs[Long]("n_kept"), r.getAs[Long]("rate_pct")))
    assert(joined.nonEmpty)
    joined.foreach { case (total, keptN, rate) =>
      val frac = keptN.toDouble / total
      // 25 docs per source in the tiny fixture -> wide but non-vacuous band
      assert(math.abs(frac - rate / 100.0) < 0.30, s"kept $frac vs rate $rate%")
    }
  }

  test("q_doc_idf: idf is monotone-decreasing in df and spans (0, ln N]") {
    val nDocs = graft.core.Tables.documents(spark, TestSpark.Sf0001).count().toDouble
    val rows = SparkEntry.queries("q_doc_idf")(spark, TestSpark.Sf0001)
      .collect().map(r => (r.getLong(1), r.getDouble(2)))
    assert(rows.nonEmpty)
    rows.foreach { case (df, idf) =>
      assert(df >= 5)
      assert(idf >= -1e-9 && idf <= math.log(nDocs / 5) + 1e-9, s"idf $idf out of range for df $df")
      assert(math.abs(idf - math.log(nDocs / df)) < 1e-5)
    }
  }

  test("q_sessionize: session counts equal gap-break counts and sessions partition each user's events") {
    val ev = graft.core.Tables.events(spark, TestSpark.Sf0001)
    val perUser = ev.groupBy("user_id").agg(count(lit(1)).as("n_events"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val sessions = SparkEntry.queries("q_sessionize")(spark, TestSpark.Sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(3)))
    // sessions within a user are numbered 1..k densely
    sessions.groupBy(_._1).foreach { case (u, ss) =>
      assert(ss.map(_._2).sorted.toSeq == (1L to ss.length).toSeq, s"user $u session ids not dense")
      // events partition: session sizes sum to the user's event count
      assert(ss.map(_._3).sum == perUser(u), s"user $u lost/duplicated events across sessions")
    }
  }

  test("q_ann_pq: probe self-retrieves at ADC distance 0 and codes stay in the codebook range") {
    val rows = SparkEntry.queries("q_ann_pq")(spark, TestSpark.Sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(rows.nonEmpty)
    // the probe (vec 0) is also codebook entry 0 in every subspace, so its
    // codes are all 0 and its ADC estimate is exactly 0 -> it must rank first
    assert(rows.head._1 == 0L, s"probe not first: ${rows.head}")
    assert(rows.head._4 == 0.0)
    assert(rows.head._2 == 0L && rows.head._3 == 0L)
    rows.foreach { case (_, c0, c1, d) =>
      assert(c0 >= 0 && c0 < 4 && c1 >= 0 && c1 < 4)
      assert(d >= 0.0)
    }
    // ADC estimates are sorted ascending (it's a top-k by estimated distance)
    assert(rows.map(_._4).toSeq == rows.map(_._4).sorted.toSeq)
  }

  test("q_ann_lsh: returns the probe itself (sim 1.0) and a subset of the exact top-k's domain") {
    val lsh = SparkEntry.queries("q_ann_lsh")(spark, TestSpark.Sf0001).collect()
    assert(lsh.nonEmpty)
    // the probe is vec_id 0's vector: it shares its own bucket and has cos=1
    assert(math.abs(lsh.head.getDouble(1) - 1.0) < 1e-9, "probe must be its own nearest neighbor")
    // every returned sim must also appear in the brute-force ranking at
    // least as far down (ANN returns true cosines, just over fewer rows)
    val exact = SparkEntry.queries("q_topk_similar")(spark, TestSpark.Sf0001)
      .collect().map(_.getDouble(1))
    assert(lsh.map(_.getDouble(1)).max <= exact.max + 1e-9)
  }
}
