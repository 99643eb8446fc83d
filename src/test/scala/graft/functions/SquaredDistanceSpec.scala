package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.TestSpark
import graft.core.Vec

/** The codegen SquaredDistance must be bit-equal to the HOF composition
  * (same left-to-right accumulation), null-safe, and robust under both
  * codegen and interpreted evaluation.
  */
class SquaredDistanceSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("bit-equal to the HOF sqDist on the embeddings fixture") {
    val emb = graft.core.Tables.embeddings(spark, TestSpark.Sf0001)
    val probe = emb.orderBy("vec_id").limit(1).select("embedding").head().getSeq[Double](0)
    val pl = array(probe.map(lit): _*)
    val diff = emb.select(
        (SquaredDistance(col("embedding"), pl) - Vec.sqDist(col("embedding"), pl)).as("d"))
      .filter(col("d") =!= 0.0)
    assert(diff.count() == 0, "codegen and HOF paths disagree bitwise")
  }

  test("null input -> null output; empty arrays -> 0") {
    val s = spark
    import s.implicits._
    val df = Seq(
      (Some(Seq(1.0, 2.0)), Some(Seq(3.0, 4.0))),
      (None, Some(Seq(1.0, 1.0))),
      (Some(Seq.empty[Double]), Some(Seq.empty[Double]))).toDF("a", "b")
    val got = df.select(SquaredDistance(col("a"), col("b"))).collect().map(r =>
      if (r.isNullAt(0)) None else Some(r.getDouble(0)))
    assert(got.toSeq == Seq(Some(8.0), None, Some(0.0)))
  }

  test("interpreted (non-codegen) eval agrees") {
    val s = spark
    import s.implicits._
    val rng = new scala.util.Random(7)
    for (_ <- 1 to 20) {
      val a = Array.fill(16)(rng.nextDouble())
      val b = Array.fill(16)(rng.nextDouble())
      val expr = SquaredDistance(
        org.apache.spark.sql.catalyst.expressions.Literal.create(a,
          org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.DoubleType)),
        org.apache.spark.sql.catalyst.expressions.Literal.create(b,
          org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.DoubleType)))
      val interpreted = expr.eval(null).asInstanceOf[Double]
      var exp = 0.0
      for (i <- a.indices) { val d = a(i) - b(i); exp += d * d }
      assert(interpreted == exp)
    }
  }
}
