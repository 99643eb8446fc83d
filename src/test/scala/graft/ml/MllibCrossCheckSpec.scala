package graft.ml

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.TestSpark
import graft.kmeans.Lloyd

/** MLlib K-Means vs our Lloyd loop: same K on the same vectors must land at
  * comparable SSE (algorithmic sanity, not hash equality — SURVEY.md §5.6).
  */
class MllibCrossCheckSpec extends AnyFunSuite {

  test("Lloyd-loop SSE is within 20% of MLlib's training cost at K=5 (sf0.001)") {
    val spark = TestSpark.spark
    val pts = graft.core.Tables.points(spark, TestSpark.Sf0001).cache()

    val (ours, _) = Lloyd.run(pts, k = 5, maxIter = 20, eps = 1e-9)
    val ourSse = Lloyd.sse(pts, ours)

    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector
    val data = pts.select(array_to_vector(col("coordinates")).as("features"))
    val model = new KMeans().setK(5).setSeed(42L).setMaxIter(20).setTol(1e-9).fit(data)
    val mllibSse = model.summary.trainingCost

    pts.unpersist()
    assert(ourSse > 0 && mllibSse > 0)
    // different inits -> different local optima; both must be in the same
    // ballpark (random 64-D gaussians cluster weakly, so optima are close)
    assert(ourSse <= mllibSse * 1.2,
      s"our SSE $ourSse vs MLlib $mllibSse — Lloyd loop is not converging properly")
  }
}
