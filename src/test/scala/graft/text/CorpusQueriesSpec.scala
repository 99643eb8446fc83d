package graft.text

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.{SparkEntry, TestSpark}

/** Properties of the corpus-hygiene family (CorpusQueries) + the salted
  * join that the hash oracle can't express: redaction completeness,
  * eval/corpus disjointness, sketch-accuracy bounds, and salted==plain
  * join equivalence.
  */
class CorpusQueriesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("q_pii_redact: every contact has exactly one email and one phone, and the redaction removes them all") {
    val rows = SparkEntry.queries("q_pii_redact")(spark, TestSpark.Sf0001)
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getString(3)))
    assert(rows.nonEmpty)
    val email = "[a-z0-9#]+@[a-z0-9-]+\\.org".r
    val phone = "555-[0-9]{4}".r
    rows.foreach { case (nE, nP, red) =>
      assert(nE == 1 && nP == 1, s"construction should plant exactly one of each, got ($nE, $nP)")
      assert(email.findFirstIn(red).isEmpty, s"unredacted email in: $red")
      assert(phone.findFirstIn(red).isEmpty, s"unredacted phone in: $red")
      assert(red.contains("<EMAIL>") && red.contains("<PHONE>"))
    }
  }

  test("q_contamination: reports only corpus docs, with positive overlap and a consistent flag") {
    val rows = SparkEntry.queries("q_contamination")(spark, TestSpark.Sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(rows.nonEmpty, "the word-soup fixture should produce some shingle overlap")
    rows.foreach { case (docId, nShared, flag) =>
      assert(docId >= CorpusQueries.EvalDocs, "eval docs must never appear as contaminated corpus docs")
      assert(nShared >= 1)
      assert(flag == (if (nShared >= 3) 1L else 0L))
    }
  }

  test("q_dedup_paragraph: every reported chunk occurs 2+ times and first_pos decodes to a real doc") {
    val docIds = graft.core.Tables.documents(spark, TestSpark.Sf0001)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val rows = SparkEntry.queries("q_dedup_paragraph")(spark, TestSpark.Sf0001)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(rows.nonEmpty, "fixture contains exact-dup docs, so chunk dups must exist")
    rows.foreach { case (_, n, firstPos) =>
      assert(n >= 2)
      assert(docIds.contains(firstPos / 1000), s"first_pos $firstPos encodes unknown doc")
    }
  }

  test("q_minhash_est: estimates live in [0,1] and identical docs estimate 1.0") {
    val rows = SparkEntry.queries("q_minhash_est")(spark, TestSpark.Sf0001)
      .collect().map(r => (r.getDouble(2), r.getDouble(3)))
    assert(rows.nonEmpty, "LSH candidates exist in the fixture")
    rows.foreach { case (est, exact) =>
      assert(est >= 0.0 && est <= 1.0)
      assert(exact >= 0.0 && exact <= 1.0)
      // identical shingle sets MUST have identical signatures
      if (exact == 1.0) assert(est == 1.0, s"exact dup pair estimated at $est")
    }
    // k=16 one-sided sanity: the mean absolute estimation error over
    // LSH-selected (i.e. high-similarity-biased) pairs stays moderate
    val mae = rows.map { case (e, x) => math.abs(e - x) }.sum / rows.length
    assert(mae <= 0.30, s"mean |est-exact| $mae implausibly large for k=16")
  }

  test("q_tokenizer_stats: chars-per-token >= 1 and min <= avg <= max per source") {
    val rows = SparkEntry.queries("q_tokenizer_stats")(spark, TestSpark.Sf0001)
      .collect().map(r => (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4)))
    assert(rows.nonEmpty)
    rows.foreach { case (n, avg, min, max) =>
      assert(n > 0)
      assert(min >= 1.0, "a BPE-ish token is at most its own characters")
      assert(min <= avg + 1e-9 && avg <= max + 1e-9)
    }
  }

  test("q_tfidf_top: exactly one winner per document with positive tfidf") {
    val nDocs = graft.core.Tables.documents(spark, TestSpark.Sf0001).count()
    val rows = SparkEntry.queries("q_tfidf_top")(spark, TestSpark.Sf0001)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
    assert(rows.length == nDocs, "every doc has a top term")
    assert(rows.map(_._1).distinct.length == rows.length)
    rows.foreach { case (_, w, s) =>
      assert(w.nonEmpty)
      assert(s >= 0.0, "idf >= 0 since df <= N, so tfidf >= 0")
    }
  }

  test("q_bigram_pmi: top-20 collocations, min support respected, sorted by pmi") {
    val rows = SparkEntry.queries("q_bigram_pmi")(spark, TestSpark.Sf0001)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3)))
    assert(rows.nonEmpty && rows.length <= 20)
    rows.foreach { case (_, _, c12, pmi) =>
      assert(c12 >= 5)
      assert(!pmi.isNaN && !pmi.isInfinite)
    }
    assert(rows.map(-_._4).toSeq == rows.map(-_._4).sorted.toSeq, "must be pmi-descending")
  }

  test("q_salted_join result equals the plain inner join aggregate") {
    val salted = SparkEntry.queries("q_salted_join")(spark, TestSpark.Sf0001).collect().toSeq
    val ev = graft.core.Tables.events(spark, TestSpark.Sf0001)
    val cust = graft.core.Tables.customer(spark, TestSpark.Sf0001)
    val plain = ev.join(cust, ev("user_id") === cust("c_custkey"))
      .groupBy(col("c_nationkey").cast("long").as("nationkey"))
      .agg(count(lit(1)).as("n"), round(sum("value"), 6).as("sum_value"))
      .orderBy("nationkey").collect().toSeq
    assert(salted == plain)
  }

  test("q_bpe_train matches a driver-side naive BPE replay over the collected vocab") {
    // independent ground truth: collect the (word, count) vocab (tiny at
    // sf0.001) and run textbook BPE — symbol lists, weighted adjacent-pair
    // counts, (n DESC, a, b) argmax, greedy left-to-right non-overlapping
    // merge — entirely on the driver, no replace()/sentinel tricks shared
    // with the implementation under test.
    val vocab = graft.core.Tables.documents(spark, TestSpark.Sf0001)
      .select(explode(split(col("text"), " ")).as("word"))
      .filter(length(col("word")) >= 1)
      .groupBy("word").agg(count(lit(1)).as("wc"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    var syms: Array[(Array[String], Long)] =
      vocab.map { case (w, c) => (w.split("").filter(_.nonEmpty), c) }
    val expected = (1 to 3).map { round =>
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      syms.foreach { case (s, c) =>
        s.sliding(2).filter(_.length == 2).foreach { p =>
          counts((p(0), p(1))) = counts.getOrElse((p(0), p(1)), 0L) + c
        }
      }
      val ((a, b), n) = counts.toSeq.minBy { case ((a, b), n) => (-n, a, b) }
      syms = syms.map { case (s, c) =>
        val out = scala.collection.mutable.ArrayBuffer.empty[String]
        var i = 0
        while (i < s.length) {
          if (i + 1 < s.length && s(i) == a && s(i + 1) == b) { out += a + b; i += 2 }
          else { out += s(i); i += 1 }
        }
        (out.toArray, c)
      }
      (round.toLong, a, b, n)
    }
    val got = SparkEntry.queries("q_bpe_train")(spark, TestSpark.Sf0001)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3))).toSeq
    assert(got == expected, s"BPE merge table mismatch:\n got=$got\n exp=$expected")
  }

  test("q_contamination plans a broadcast join for the eval set (no corpus-side shuffle for the join)") {
    val plan = SparkEntry.queries("q_contamination")(spark, TestSpark.Sf0001)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"expected broadcast join, got:\n$plan")
    assert(!plan.contains("SortMergeJoin"), "corpus side must not shuffle for the join")
  }
}
