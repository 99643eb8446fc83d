package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.TestSpark

/** The bounded top-k Aggregator must be merge-order/partitioning-invariant
  * (it runs as partial+final over arbitrary splits) and must equal the
  * window-rank formulation it replaces.
  */
class TopKAggSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def scored = {
    val s = spark
    import s.implicits._
    (0 until 5000).map { i =>
      (i % 7L, i.toLong, math.sin(i).abs) // (group, id, sim) with dup sims
    }.toDF("g", "id", "sim")
  }

  test("TopKAgg equals window row_number top-k with (sim desc, id) ties") {
    val topk = udaf(new TopKAgg(5),
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[ScoredId]())
    val viaAgg = scored.groupBy("g").agg(topk(col("id"), col("sim")).as("nn"))
      .select(col("g"), posexplode(col("nn")).as(Seq("pos", "n")))
      .select(col("g"), (col("pos") + 1).as("rank"), col("n.id").as("id"), col("n.sim").as("sim"))
    val w = Window.partitionBy("g").orderBy(col("sim").desc, col("id"))
    val viaWindow = scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 5).select("g", "rank", "id", "sim")
    assert(viaAgg.exceptAll(viaWindow).isEmpty && viaWindow.exceptAll(viaAgg).isEmpty)
  }

  test("TopKAgg is partitioning-invariant (partial+final merge over any split)") {
    val topk = udaf(new TopKAgg(3),
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[ScoredId]())
    def run(parts: Int) = scored.repartition(parts)
      .groupBy("g").agg(topk(col("id"), col("sim")).as("nn"))
      .orderBy("g").collect().map(_.toString).toSeq
    assert(run(1) == run(13))
  }
}
