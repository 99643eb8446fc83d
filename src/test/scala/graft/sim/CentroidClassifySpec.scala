package graft.sim

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.TestSpark
import graft.core.{Tables, Vec}

/** Nearest-centroid classifier eval: the broadcast-argmin path must agree
  * with an independent window-rank recomputation, and the plan must keep
  * the prototype join broadcast (never a shuffle of the corpus).
  */
class CentroidClassifySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("confusion matrix matches an independent window-rank classifier") {
    val got = SimilarityQueries.queries("q_centroid_classify")(spark, TestSpark.Sf0001)
    val emb = Tables.embeddings(spark, TestSpark.Sf0001)
      .select(col("vec_id"), col("label").cast("long").as("label"), col("embedding").as("v"))
    val cents = emb.select(col("label"), posexplode(col("v")).as(Seq("dim", "x")))
      .groupBy("label", "dim").agg(avg("x").as("m"))
      .groupBy("label")
      .agg(array_sort(collect_list(struct(col("dim"), round(col("m"), 7).as("m")))).as("ms"))
      .select(col("label").as("c_label"),
        transform(col("ms"), e => e.getField("m")).as("centroid"))
    val w = Window.partitionBy("vec_id")
      .orderBy(col("d"), col("c_label"))
    val expected = emb.crossJoin(cents)
      .select(col("vec_id"), col("label"), col("c_label"),
        round(Vec.sqDist(col("v"), col("centroid")), 9).as("d"))
      .withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .groupBy(col("label").as("true_label"), col("c_label").as("pred_label"))
      .agg(count(lit(1)).as("n"))
    assert(got.exceptAll(expected).isEmpty && expected.exceptAll(got).isEmpty)
    // every vector is classified exactly once
    val total = got.agg(sum("n")).head.getLong(0)
    assert(total == emb.count())
  }

  test("prototype join is broadcast; corpus rows are never shuffled for scoring") {
    val p = SimilarityQueries.queries("q_centroid_classify")(spark, TestSpark.Sf0001)
      .queryExecution.executedPlan.toString
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"),
      s"centroid join not broadcast:\n$p")
    assert(!p.contains("SortMergeJoin"), s"corpus shuffled for scoring:\n$p")
  }
}
