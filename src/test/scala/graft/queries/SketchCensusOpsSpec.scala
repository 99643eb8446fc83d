package graft.queries

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{SparkEntry, TestSpark}

/** Semantic invariants of q_fm_sketch / q_market_basket / q_wau_sliding /
  * q_mahalanobis — above all the FM sketch's MERGE property (shard-local
  * sketches combine losslessly), which is the whole reason a sketch is the
  * right cardinality tool at 100 TB.
  */
class SketchCensusOpsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private def run(name: String): Array[Row] =
    SparkEntry.queries(name)(spark, TestSpark.Sf0001).collect()

  /** FM register frame (j -> bitmap) for one document subset. */
  private def registers(parityFilter: Option[Int]) = {
    val docs = graft.core.Tables.documents(spark, TestSpark.Sf0001)
    val base = parityFilter match {
      case Some(p) => docs.filter(pmod(col("doc_id"), lit(2)) === p)
      case None    => docs
    }
    base.select(explode(split(col("text"), " ")).as("w"))
      .select(conv(substring(md5(col("w")), 1, 15), 16, 10).cast("long").as("v"))
      .select(pmod(col("v"), lit(64L)).as("j"),
        expr("(v DIV 64) & -(v DIV 64)").as("lsb"))
      .groupBy("j").agg(expr("bit_or(lsb)").as("b"))
  }

  test("q_fm_sketch: parity-split sketches bit_or-merge into the whole-corpus sketch") {
    val whole = registers(None).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val even = registers(Some(0)).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val odd = registers(Some(1)).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val merged = (even.keySet ++ odd.keySet).map(j =>
      j -> (even.getOrElse(j, 0L) | odd.getOrElse(j, 0L))).toMap
    assert(merged === whole,
      "bit_or of half-corpus sketches must equal the whole-corpus sketch")
  }

  test("q_fm_sketch: idempotence — re-inserting every word changes no register") {
    val once = registers(None).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val docs = graft.core.Tables.documents(spark, TestSpark.Sf0001)
    val doubled = docs.unionAll(docs)
      .select(explode(split(col("text"), " ")).as("w"))
      .select(conv(substring(md5(col("w")), 1, 15), 16, 10).cast("long").as("v"))
      .select(pmod(col("v"), lit(64L)).as("j"),
        expr("(v DIV 64) & -(v DIV 64)").as("lsb"))
      .groupBy("j").agg(expr("bit_or(lsb)").as("b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(doubled === once, "sketch insert must be idempotent under duplication")
  }

  test("q_fm_sketch: the union estimate lands inside the sketch's error band") {
    val rows = run("q_fm_sketch")
    val all = rows.find(_.getAs[String]("source") == "__ALL__").get
    // the tiny fixture vocabulary sits in the small-cardinality regime, so
    // the linear-counting branch must engage and land close; a band failure
    // means the register math or the LC switch broke (deterministic — the
    // sketch is md5-derived, so this can never flake)
    val ratio = all.getAs[Double]("est_vs_exact_x100")
    assert(ratio > 60.0 && ratio < 160.0,
      s"union estimate off by more than the sketch's error model: $ratio%")
    rows.foreach { r =>
      val alg = r.getAs[String]("alg")
      if (alg == "lc") assert(r.getAs[Long]("v_empty") > 0L,
        "linear counting requires at least one empty register")
    }
    // per-source exact counts must sum to >= the union exact (overlap)
    val srcSum = rows.filter(_.getAs[String]("source") != "__ALL__")
      .map(_.getAs[Long]("n_words")).sum
    assert(srcSum >= all.getAs[Long]("n_words"))
  }

  test("q_market_basket: counts nest and the integer verdicts replay") {
    val items = graft.core.Tables.lineitem(spark, TestSpark.Sf0001)
      .select(col("l_orderkey"), col("l_partkey")).distinct()
    val nOrders = items.select("l_orderkey").distinct().count()
    run("q_market_basket").foreach { r =>
      val (ab, a, b) = (r.getAs[Long]("n_ab"), r.getAs[Long]("n_a"), r.getAs[Long]("n_b"))
      assert(ab >= 2 && ab <= math.min(a, b),
        "pair support cannot exceed either item's support")
      assert(r.getAs[Long]("support_ppm") === ab * 1000000L / nOrders)
      assert(r.getAs[Long]("lift_x100") === ab * nOrders * 100L / (a * b))
    }
  }

  test("q_wau_sliding: weekly actives bound daily actives and their 7-day sum") {
    val rows = run("q_wau_sliding").sortBy(_.getAs[java.sql.Date]("day").getTime)
    val daus = rows.map(_.getAs[Long]("dau"))
    rows.zipWithIndex.foreach { case (r, i) =>
      val wau = r.getAs[Long]("wau7")
      assert(wau >= r.getAs[Long]("dau"), "a window contains its end day")
      // distinct users over 7 days can never exceed the sum of dailies
      val window = daus.slice(math.max(0, i - 6), i + 1).sum
      assert(wau <= window, s"day $i: wau $wau > 7-day dau sum $window")
    }
    // the first observed day's window holds only that day
    assert(rows.head.getAs[Long]("wau7") === rows.head.getAs[Long]("dau"))
  }

  test("q_mahalanobis: the snapped model self-normalizes mean d2 to ~dim") {
    val r = run("q_mahalanobis").head
    assert(r.getAs[Long]("n_vectors") ===
      graft.core.Tables.embeddings(spark, TestSpark.Sf0001).count())
    // E[d2] = sum over dims of E[(x-mu)^2]/s2 = d by construction of the
    // model — a band failure means the variance estimate or fold broke
    val mean = r.getAs[Double]("mean_d2")
    assert(mean > 56.0 && mean < 72.0, s"mean d2 $mean far from dim=64")
    assert(r.getAs[Long]("outlier_ppm") ===
      r.getAs[Long]("n_outliers") * 1000000L / r.getAs[Long]("n_vectors"))
    assert(r.getAs[Double]("max_d2") >= mean)
  }

  test("q_bloom_plan: the sized filter actually achieves near-optimal bits/key") {
    val rows = graft.SparkEntry.queries("q_bloom_plan")(
      graft.TestSpark.spark, graft.TestSpark.Sf0001).collect()
    assert(rows.length == 6)
    rows.foreach { r =>
      val n = r.getAs[Long]("n_distinct"); val m = r.getAs[Long]("m_bits")
      val bitsPerKey = m.toDouble / n
      // closed-form optima 9.584963 / 14.377445 bits per key; the integer
      // ceil can only add granularity, bounded by a few ulps of 1/n
      val c = if (r.getAs[Long]("fpr_ppm") == 10000L) 9.584963 else 14.377445
      assert(bitsPerKey >= c - 1e-6 && bitsPerKey <= c + 2.0 / n + 1e-6,
        s"bits/key $bitsPerKey vs $c (n=$n)")
      assert(r.getAs[Long]("k_hashes") == (if (r.getAs[Long]("fpr_ppm") == 10000L) 7L else 10L))
      assert(r.getAs[Long]("m_kib") == m / 8192)
    }
  }
}
