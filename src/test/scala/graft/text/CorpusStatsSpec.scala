package graft.text

import org.apache.spark.sql.Row
import org.scalatest.funsuite.AnyFunSuite

import graft.{SparkEntry, TestSpark}

/** Semantic invariants of the corpus-shape statistics (q_zipf_fit,
  * q_heaps_law, q_url_dedup, q_source_lift). Byte-level cross-engine
  * equality lives in the oracle gate; these pin the laws' defining
  * properties and the canonicalizer's idempotence class.
  */
class CorpusStatsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private def run(name: String): Array[Row] =
    SparkEntry.queries(name)(spark, TestSpark.Sf0001).collect()

  test("q_zipf_fit: rank-frequency slope is negative and sane") {
    val r = run("q_zipf_fit").head
    assert(r.getAs[Long]("n_fit") > 10L)
    val slope = r.getAs[Double]("slope")
    // frequencies are non-increasing in rank → slope must be negative;
    // the synthetic ~30-word vocabulary is flatter than a natural corpus
    // (it exhausts the head), so only sign and magnitude-sanity are pinned
    assert(slope < 0.0 && slope > -3.0, s"slope $slope outside (-3, 0)")
  }

  test("q_heaps_law: both cumulatives monotone, vocab sub-linear, beta in (0,1)") {
    val rows = run("q_heaps_law").sortBy(_.getAs[Long]("bucket"))
    assert(rows.length == 10)
    val toks = rows.map(_.getAs[Long]("tokens_cum"))
    val vocab = rows.map(_.getAs[Long]("vocab_cum"))
    assert(toks.zip(toks.tail).forall { case (a, b) => a < b })
    assert(vocab.zip(vocab.tail).forall { case (a, b) => a <= b })
    // the template corpus closes its vocabulary early: far fewer distinct
    // terms than tokens, and beta reflects the sub-linear growth
    assert(vocab.last < toks.last / 10)
    val beta = rows.head.getAs[Double]("beta")
    assert(beta >= 0.0 && beta < 1.0, s"beta $beta outside [0, 1)")
  }

  test("q_url_dedup: canonical never exceeds raw count; variants do collide") {
    val rows = run("q_url_dedup")
    rows.foreach { r =>
      val (n, c) = (r.getAs[Long]("n_docs"), r.getAs[Long]("n_canonical"))
      assert(c >= 1L && c <= n)
      assert(r.getAs[Long]("dup_ppm") == (n - c) * 1000000L / n)
    }
    // the derivation maps ~25 docs/source onto 50 path slots with
    // scheme/www/suffix noise the canonicalizer must fold — across all
    // sources at least SOME collisions must surface, else the
    // canonicalizer is a no-op
    assert(rows.map(_.getAs[Long]("dup_ppm")).sum > 0L)
  }

  test("q_source_lift: 3 ranked terms per source, lift sane") {
    val rows = run("q_source_lift")
    val bySource = rows.groupBy(_.getAs[String]("source"))
    assert(bySource.size == 20)
    bySource.foreach { case (src, rs) =>
      assert(rs.map(_.getAs[Int]("rk")).sorted.toSeq == Seq(1, 2, 3), src)
      // rank 1 lift >= rank 3 lift within a source
      val sorted = rs.sortBy(_.getAs[Int]("rk"))
      assert(sorted.head.getAs[Long]("lift_x1e6") >=
        sorted.last.getAs[Long]("lift_x1e6"))
    }
    // lift of 1.0 (=1e6) is the corpus-average baseline; a top term should
    // be at least average somewhere
    assert(rows.exists(_.getAs[Long]("lift_x1e6") >= 1000000L))
  }

  test("q_log_odds: 3 ranked rows per source, z consistent with over-representation") {
    val rows = run("q_log_odds")
    val bySrc = rows.groupBy(_.getAs[String]("source"))
    assert(bySrc.values.forall(_.length == 3))
    bySrc.values.foreach { rs =>
      val sorted = rs.sortBy(_.getAs[Int]("rk"))
      val zs = sorted.map(_.getAs[Double]("z"))
      assert(zs.zip(zs.tail).forall { case (a, b) => a >= b }, "z not descending in rank")
      // a top distinctive term is genuinely present in the source
      sorted.foreach(r => assert(r.getAs[Long]("y") > 0))
    }
  }

  test("q_boilerplate: share identities and the >=3-docs occurrence floor") {
    val rows = run("q_boilerplate")
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val n = r.getAs[Long]("n_chunks")
      val occ = r.getAs[Long]("boiler_occ")
      val dist = r.getAs[Long]("boiler_distinct")
      assert(n > 0 && occ >= 0 && occ <= n)
      // every boilerplate chunk appears in >= 3 distinct docs, so its
      // occurrence count is >= 3 — the occurrence mass floors at 3x the
      // distinct-chunk count
      assert(occ >= 3 * dist, s"occ $occ < 3 * distinct $dist")
      assert(r.getAs[Long]("boiler_ppm") == occ * 1000000L / n)
    }
  }

  test("q_readability: masses recompute exactly; LIX decomposes into its terms") {
    val rows = run("q_readability")
    val docs = graft.core.Tables.documents(spark, TestSpark.Sf0001)
      .select("source", "text").collect()
      .groupBy(_.getAs[String]("source"))
    rows.foreach { r =>
      val src = r.getAs[String]("source")
      val words = docs(src).flatMap(_.getAs[String]("text").split(" ")).filter(_.nonEmpty)
      assert(r.getAs[Long]("n_words") == words.length.toLong)
      val longW = words.count(_.length >= 7).toLong
      // nested-floor identity: floor(floor(10x)/10) == floor(x), so the ppm
      // column determines the LIX long-word term exactly
      assert(r.getAs[Long]("long_word_ppm") == longW * 1000000L / words.length)
      val lix = r.getAs[Long]("n_words") * 1000L / r.getAs[Long]("n_docs") +
        longW * 100000L / words.length
      assert(r.getAs[Long]("lix_milli") == lix)
      val m = r.getAs[Long]("mono_ppm")
      assert(m >= 0 && m <= 1000000L)
    }
  }

  test("q_stupid_backoff: 50 probes, branch discipline, scores in (0, 1e6]") {
    val rows = run("q_stupid_backoff")
    assert(rows.length == 50)
    rows.foreach { r =>
      val lvl = r.getAs[Long]("backoff_level")
      val c3 = r.getAs[Long]("c3")
      assert(Set(0L, 1L, 2L).contains(lvl))
      // level 0 iff the trigram itself was observed
      assert((lvl == 0L) == (c3 > 0L), s"level $lvl with c3=$c3")
      val sc = r.getAs[Long]("score_ppm")
      // S > 0 always (the last backoff hits a top-5 unigram, count >= 1);
      // S <= 1 at level 0 (c3 <= c2_12), and the 0.4 discounts keep the
      // backed-off branches under 1e6 too
      assert(sc > 0L && sc <= 1000000L, s"score_ppm $sc")
    }
  }
}
