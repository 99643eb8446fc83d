package graft.kmeans

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.TestSpark

/** VecMeanAgg invariants (SURVEY.md §5.3): the (sum, count) buffer is
  * merge-order / partitioning invariant, and matches a scalar mean.
  * (Property-style: seeded random cases, no scalatestplus bridge needed.)
  */
class VecMeanAggSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("mean is partitioning-invariant (1 vs 8 partitions)") {
    val s = spark
    import s.implicits._
    val data = (0 until 64).map(i => (i % 3, Array.tabulate(4)(d => (i * 31 + d).toDouble / 7)))
    def meanAt(parts: Int) =
      data.toDF("g", "v").repartition(parts)
        .groupBy("g").agg(VecMeanAgg(col("v")).as("m")).orderBy("g")
        .collect().map(r => (r.getInt(0), r.getSeq[Double](1).toSeq))
    val one = meanAt(1)
    val eight = meanAt(8)
    for (((g1, m1), (g8, m8)) <- one.zip(eight)) {
      assert(g1 == g8)
      for (i <- m1.indices) assert(math.abs(m1(i) - m8(i)) < 1e-12)
    }
  }

  test("scalar reduce/merge laws: zero identity, merge-direction invariance") {
    val rng = new scala.util.Random(42)
    for (_ <- 1 to 50) {
      val chunks = List.fill(1 + rng.nextInt(4))(
        List.fill(rng.nextInt(6))(Seq.fill(3)(rng.nextDouble() * 10)))
      // reduce/merge mutate buffers in place (Spark owns them); rebuild the
      // partial buffers for each fold direction.
      def bufs = chunks.map(_.foldLeft(VecMeanAgg.zero)(VecMeanAgg.reduce))
      val leftFold = bufs.foldLeft(VecMeanAgg.zero)(VecMeanAgg.merge)
      val rightFold = bufs.foldRight(VecMeanAgg.zero)((a, b) => VecMeanAgg.merge(b, a))
      assert(leftFold.n == rightFold.n)
      val fl = VecMeanAgg.finish(leftFold)
      val fr = VecMeanAgg.finish(rightFold)
      assert(fl.size == fr.size)
      for (i <- fl.indices) assert(math.abs(fl(i) - fr(i)) < 1e-12)
      // zero identity
      assert(VecMeanAgg.finish(VecMeanAgg.merge(leftFold, VecMeanAgg.zero)) == fl)
    }
  }

  test("matches scalar mean on the reference sample") {
    val s = spark
    import s.implicits._
    val df = TestSpark.refPointsDf
    val got = df.agg(VecMeanAgg(col("coordinates"))).head().getSeq[Double](0)
    val exp = Array(
      TestSpark.refPoints.map(_._2(0)).sum / 20,
      TestSpark.refPoints.map(_._2(1)).sum / 20)
    for (i <- exp.indices) assert(math.abs(got(i) - exp(i)) < 1e-12)
  }
}
