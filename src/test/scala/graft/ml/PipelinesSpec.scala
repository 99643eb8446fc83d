package graft.ml

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.TestSpark

/** MLlib wrapper behavior: featurization shapes and ANN sanity vs the
  * exact brute-force ranking.
  */
class PipelinesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("tf-idf produces one sparse vector per document") {
    val out = Pipelines.tfidf(spark, TestSpark.Sf0001)
    assert(out.count() == 500)
    val v = out.select("tfidf").head().getAs[org.apache.spark.ml.linalg.Vector](0)
    assert(v.numNonzeros > 0)
  }

  test("MinHashLSH self-join returns verified low-distance pairs only") {
    val pairs = Pipelines.minhashLshPairs(spark, TestSpark.Sf0001, maxDistance = 0.9)
    assert(pairs.filter(col("jaccard_dist") > 0.9).count() == 0)
  }

  test("BucketedRandomProjectionLSH ANN includes the probe itself at distance 0") {
    val nn = Pipelines.annNeighbors(spark, TestSpark.Sf0001, k = 5)
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    assert(nn.nonEmpty)
    assert(nn.exists { case (id, d) => id == 0L && d == 0.0 },
      "probe vector (vec_id 0) must be its own nearest neighbor")
  }
}
