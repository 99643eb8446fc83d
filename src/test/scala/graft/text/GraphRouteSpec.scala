package graft.text

import org.scalatest.funsuite.AnyFunSuite

import graft.{SparkEntry, TestSpark}

/** Semantic invariants of q_rendezvous_route (HRW elastic rescale) and
  * q_hits_rank (integer-renormalized HITS). The cross-engine byte check
  * is the DuckDB oracle gate; these pin the algorithmic guarantees.
  */
class GraphRouteSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("q_rendezvous_route: adding a shard moves docs ONLY to the new shard") {
    val rows = SparkEntry.queries("q_rendezvous_route")(spark, TestSpark.Sf0001).collect()
    val nDocs = graft.core.Tables.documents(spark, TestSpark.Sf0001).count()
    assert(rows.map(_.getAs[Long]("n_before")).sum == nDocs)
    assert(rows.map(_.getAs[Long]("n_after")).sum == nDocs)
    rows.foreach { r =>
      val shard = r.getAs[String]("shard")
      if (shard != "s4")
        assert(r.getAs[Long]("n_moved_in") == 0,
          s"HRW violated: old shard $shard gained ${r.getAs[Long]("n_moved_in")} docs")
      else {
        assert(r.getAs[Long]("n_before") == 0)
        // expected movement is ~1/5 of the corpus; allow a wide band
        val frac = r.getAs[Long]("n_moved_in").toDouble / nDocs
        assert(frac > 0.10 && frac < 0.33, s"moved fraction $frac outside the HRW expectation")
      }
    }
  }

  test("q_graph_modularity: Q in [-0.5, 1], and the same-source partition beats a broken one") {
    val r = SparkEntry.queries("q_graph_modularity")(spark, TestSpark.Sf0001).collect().head
    val q = r.getAs[Double]("q_mod")
    assert(q >= -0.5 && q <= 1.0, s"modularity out of range: $q")
    assert(r.getAs[Long]("n_edges") > 0 && r.getAs[Long]("n_communities") > 0)
  }

  test("q_histo_quantile_merge: sketch percentile lower-bounds the exact within an octave slice") {
    val rows = SparkEntry.queries("q_histo_quantile_merge")(spark, TestSpark.Sf0001).collect()
    assert(rows.map(_.getAs[Long]("p")).sorted.sameElements(Seq(50L, 95L, 99L)))
    rows.foreach { r =>
      val est = r.getAs[Long]("est_cents"); val exact = r.getAs[Long]("exact_cents")
      assert(est <= exact, s"bucket lower bound must not exceed the exact value: $r")
      // sub-bucket width is 1/16 of the octave -> relative error < 1/8
      assert((exact - est).toDouble / exact < 0.125,
        s"sketch error above the 2^-4 + rounding design bound: $r")
      assert(r.getAs[Long]("err_ppm") >= 0)
    }
  }

  test("q_hits_rank: both roles rank 10, top score is the 1e6 grid point, scores non-increasing") {
    val rows = SparkEntry.queries("q_hits_rank")(spark, TestSpark.Sf0001).collect()
    val byRole = rows.groupBy(_.getAs[String]("role"))
    assert(byRole.keySet == Set("auth", "hub"))
    byRole.foreach { case (role, rs) =>
      val sorted = rs.sortBy(_.getAs[Int]("rk"))
      assert(sorted.map(_.getAs[Int]("rk")).sameElements(1 to sorted.length))
      assert(sorted.head.getAs[Long]("score_x1e6") == 1000000L,
        s"$role: renormalization lost the max grid point")
      val scores = sorted.map(_.getAs[Long]("score_x1e6"))
      assert(scores.sliding(2).forall(p => p.head >= p.last), s"$role scores not sorted")
    }
  }

  test("q_conductance: volume conservation and the phi bound") {
    val spark = graft.TestSpark.spark
    val rows = graft.SparkEntry.queries("q_conductance")(spark, graft.TestSpark.Sf0001)
      .collect()
    assert(rows.nonEmpty)
    val e = graft.text.TextQueries.simhashPairsFor(spark, graft.TestSpark.Sf0001).count()
    // Σ vol_c = 2m (every edge contributes its two endpoints' communities)
    assert(rows.map(_.getAs[Long]("vol")).sum == 2 * e)
    rows.foreach { r =>
      val phi = r.getAs[Double]("phi")
      assert(phi >= 0.0 && phi <= 1.0 + 1e-9, s"phi $phi out of [0,1]")
      assert(r.getAs[Long]("cut") <= r.getAs[Long]("vol"))
    }
  }

  test("q_assortativity: r in [-1, 1] and recomputes from the exact edge degrees") {
    val spark = graft.TestSpark.spark
    val row = graft.SparkEntry.queries("q_assortativity")(spark, graft.TestSpark.Sf0001)
      .collect().head
    val e = graft.text.TextQueries.simhashPairsFor(spark, graft.TestSpark.Sf0001)
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1)))
    val deg = e.flatMap(p => Seq(p._1, p._2)).groupBy(identity).view
      .mapValues(_.length.toLong).toMap
    val xy = e.flatMap(p => Seq((deg(p._1), deg(p._2)), (deg(p._2), deg(p._1))))
    val n = xy.length.toLong
    val sx = xy.map(_._1).sum
    val sxx = xy.map(q => q._1 * q._1).sum
    val sxy = xy.map(q => q._1 * q._2).sum
    assert(row.getAs[Long]("n_edges") == e.length.toLong)
    assert(row.getAs[Long]("n_nodes") == deg.size.toLong)
    val den = n.toDouble * sxx - sx.toDouble * sx
    val expected =
      if (den == 0.0) 0.0
      else BigDecimal(( n.toDouble * sxy - sx.toDouble * sx ) / den)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val r = row.getAs[Double]("r_assort")
    assert(math.abs(r - expected) < 2e-6, s"r=$r expected=$expected")
    assert(r >= -1.000001 && r <= 1.000001)
  }
}
