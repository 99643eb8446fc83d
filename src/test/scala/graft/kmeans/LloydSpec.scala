package graft.kmeans

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.TestSpark

/** Exact-semantics parity with the reference on its own sample
  * (FIXTURES.md A4) + Lloyd invariants (SURVEY.md §5.2-5.3).
  */
class LloydSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  /** Plain-Scala replica of one reference iteration (mapper.py:57-68 argmin
    * with strict '<' tie-break, reducer.py:19-30 mean) used as the expected
    * value — computed independently of any Spark dataflow.
    */
  private def expectedIter1(pts: Seq[(Long, Array[Double])], cents: Seq[Centroid]) = {
    val assign = pts.map { case (id, p) =>
      val best = cents.map(c => {
        var s = 0.0; var i = 0
        while (i < p.length) { val d = p(i) - c.coordinates(i); s += d * d; i += 1 }
        (s, c.cid)
      }).min // (dist, cid) lexicographic: strict '<' keeps lower cid on ties
      (id, best._2)
    }.toMap
    val means = pts.groupBy { case (id, _) => assign(id) }.map { case (cid, grp) =>
      val d = grp.head._2.length
      val sum = new Array[Double](d)
      grp.foreach { case (_, p) => var i = 0; while (i < d) { sum(i) += p(i); i += 1 } }
      cid -> sum.map(_ / grp.size)
    }
    (assign, means)
  }

  test("iteration 1 on the reference's 20-point sample matches a scalar replica") {
    val df = TestSpark.refPointsDf
    val cents = Lloyd.initCentroids(df, 2)
    assert(cents.map(_.cid) == Seq(1, 2))
    assert(cents.head.coordinates.toSeq == TestSpark.refPoints.head._2.toSeq)

    val (expAssign, expMeans) = expectedIter1(TestSpark.refPoints, cents)
    val gotAssign = Lloyd.assign(df, cents).select("vec_id", "cid")
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(gotAssign == expAssign)

    val gotMeans = Lloyd.updateExplode(Lloyd.assign(df, cents))
      .collect().map(r => r.getInt(0) -> r.getSeq[Double](1).toArray).toMap
    assert(gotMeans.keySet == expMeans.keySet)
    for ((cid, exp) <- expMeans; got = gotMeans(cid); i <- exp.indices)
      assert(math.abs(got(i) - exp(i)) < 1e-12, s"cid=$cid dim=$i")
  }

  test("Aggregator and posexplode mean paths agree") {
    val df = TestSpark.refPointsDf
    val cents = Lloyd.initCentroids(df, 3)
    val a = Lloyd.updateAgg(Lloyd.assign(df, cents)).orderBy("cid")
      .collect().map(r => (r.getInt(0), r.getSeq[Double](1).toSeq))
    val b = Lloyd.updateExplode(Lloyd.assign(df, cents)).orderBy("cid")
      .collect().map(r => (r.getInt(0), r.getSeq[Double](1).toSeq))
    assert(a.length == b.length)
    for (((cidA, va), (cidB, vb)) <- a.zip(b)) {
      assert(cidA == cidB)
      for (i <- va.indices) assert(math.abs(va(i) - vb(i)) < 1e-9)
    }
  }

  test("ties go to the lower centroid id (mapper.py:64 strict '<')") {
    val s = spark
    import s.implicits._
    // both centroids equidistant from the single point
    val pts = Seq((0L, Array(0.0, 0.0))).toDF("vec_id", "coordinates")
    val cents = Seq(Centroid(1, Array(1.0, 0.0)), Centroid(2, Array(-1.0, 0.0)))
    val cid = Lloyd.assign(pts, cents).select("cid").head().getInt(0)
    assert(cid == 1)
  }

  test("empty clusters vanish from the next round (reducer.py:59-67)") {
    val s = spark
    import s.implicits._
    val pts = Seq((0L, Array(0.0, 0.0)), (1L, Array(1.0, 0.0))).toDF("vec_id", "coordinates")
    // centroid 3 is far away: no point assigns to it
    val cents = Seq(Centroid(1, Array(0.0, 0.0)), Centroid(2, Array(1.0, 0.0)),
      Centroid(3, Array(1e6, 1e6)))
    val cids = Lloyd.updateExplode(Lloyd.assign(pts, cents))
      .select("cid").collect().map(_.getInt(0)).toSet
    assert(cids == Set(1, 2))
  }

  test("SSE is non-increasing across Lloyd iterations (sf0.001)") {
    val pts = graft.core.Tables.points(spark, TestSpark.Sf0001).cache()
    var cents = Lloyd.initCentroids(pts, 5)
    var prevSse = Double.MaxValue
    for (_ <- 1 to 4) {
      val sse = Lloyd.sse(pts, cents)
      assert(sse <= prevSse + 1e-6, s"SSE increased: $prevSse -> $sse")
      prevSse = sse
      cents = Lloyd.updateAgg(Lloyd.assign(pts, cents)).orderBy("cid")
        .collect().map(r => Centroid(r.getInt(0), r.getSeq[Double](1).toArray)).toSeq
    }
    pts.unpersist()
  }

  test("full loop converges and assignment is a fixpoint at convergence") {
    val df = TestSpark.refPointsDf
    val (cents, iters) = Lloyd.run(df, k = 2, maxIter = 50, eps = 1e-9)
    assert(iters < 50, "did not converge")
    // one more update moves nothing
    val next = Lloyd.updateAgg(Lloyd.assign(df, cents)).orderBy("cid")
      .collect().map(r => Centroid(r.getInt(0), r.getSeq[Double](1).toArray))
    assert(next.length == cents.length)
    for ((n, c) <- next.zip(cents.sortBy(_.cid)); i <- n.coordinates.indices)
      assert(math.abs(n.coordinates(i) - c.coordinates(i)) < 1e-9)
  }

  test("convergence compares by centroid id, not position (master.py:100 zip bug fixed)") {
    val s = spark
    import s.implicits._
    // 2 tight clusters + 1 unhit centroid: after iter 1 the id set shrinks,
    // so the loop must NOT report convergence on that round.
    val pts = Seq((0L, Array(0.0, 0.0)), (1L, Array(0.1, 0.0)),
      (2L, Array(10.0, 0.0)), (3L, Array(10.1, 0.0))).toDF("vec_id", "coordinates")
    val (cents, iters) = Lloyd.run(pts, k = 3, maxIter = 10, eps = 1e-6)
    // k=3 init = first 3 points -> cluster 3 (at 10.0) absorbs point 3; cluster
    // 1/2 split {0},{1}; loop continues until stable with the surviving ids
    assert(iters >= 2)
    assert(cents.map(_.cid).toSet.subsetOf(Set(1, 2, 3)))
  }

  test("q_ari: matches a driver-side exact ARI over the same assignment") {
    val row = graft.SparkEntry.queries("q_ari")(spark, TestSpark.Sf0001)
      .collect().head
    val cents = Lloyd.initCentroidsFor(spark, TestSpark.Sf0001, KmeansQueries.K)
    val pts = graft.core.Tables.points(spark, TestSpark.Sf0001)
      .withColumn("cid", Lloyd.assignCol(cents, col("coordinates")))
      .select("vec_id", "cid").collect()
      .map(r => r.getAs[Long]("vec_id") -> r.getAs[Int]("cid")).toMap
    val labs = graft.core.Tables.embeddings(spark, TestSpark.Sf0001)
      .select("vec_id", "label").collect()
      .map(r => r.getAs[Long]("vec_id") -> r.getAs[Int]("label"))
    val cells = labs.groupBy { case (v, l) => (pts(v), l) }
      .view.mapValues(_.length.toLong).toMap
    def c2(x: Long) = x * (x - 1) / 2
    val sij = cells.values.map(c2).sum
    val sa = cells.groupBy(_._1._1).values.map(v => c2(v.values.sum)).sum
    val sb = cells.groupBy(_._1._2).values.map(v => c2(v.values.sum)).sum
    val n = labs.length.toLong
    val n2 = c2(n)
    val expected = BigDecimal(
      2.0 * (sij.toDouble * n2.toDouble - sa.toDouble * sb.toDouble) /
        ((sa + sb).toDouble * n2.toDouble - 2.0 * sa.toDouble * sb.toDouble))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(row.getAs[Long]("sij") == sij && row.getAs[Long]("sa") == sa &&
      row.getAs[Long]("sb") == sb)
    assert(math.abs(row.getAs[Double]("ari") - expected) < 2e-6,
      s"ari ${row.getAs[Double]("ari")} vs $expected")
    // sanity: ARI is bounded by 1 and chance-corrected around 0
    assert(row.getAs[Double]("ari") <= 1.0)
  }

  test("q_v_measure: scores bounded, V is the harmonic mean, conditioning holds") {
    val r = graft.SparkEntry.queries("q_v_measure")(spark, TestSpark.Sf0001)
      .collect().head
    val h = r.getAs[Long]("homogeneity_ppm")
    val c = r.getAs[Long]("completeness_ppm")
    val v = r.getAs[Long]("v_ppm")
    // conditioning can only reduce entropy, so both scores sit in
    // [0, 1e6] up to one micro-nat rounding grain
    assert(h >= -5L && h <= 1000000L, s"homogeneity $h")
    assert(c >= -5L && c <= 1000000L, s"completeness $c")
    assert(v == 2 * h * c / (h + c), "V must be the harmonic mean")
    assert(v <= math.max(h, c) && v >= math.min(h, c) - 1)
  }
}
