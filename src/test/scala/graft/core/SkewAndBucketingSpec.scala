package graft.core

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.TestSpark

/** Scale-path utilities: salted aggregation/joins must be result-identical
  * to their unsalted forms on skewed data, and bucketed tables must
  * co-locate joins (no shuffle Exchange in the plan).
  */
class SkewAndBucketingSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  /** Zipf-ish skew: key 0 holds ~75% of rows. */
  private def skewed = {
    val s = spark
    import s.implicits._
    (0 until 20000).map { i =>
      val k = if (i % 4 != 0) 0L else (i % 97).toLong
      (i.toLong, k, (i % 13).toDouble)
    }.toDF("row_id", "k", "v").repartition(8)
  }

  test("salted count/sum equal unsalted results on skewed keys") {
    val df = skewed.cache()
    try {
      val plainC = df.groupBy("k").agg(count(lit(1)).as("n"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val saltedC = Skew.saltedCount(df, "k", col("row_id"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(saltedC == plainC)

      val plainS = df.groupBy("k").agg(sum("v").as("sum_v"))
        .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
      val saltedS = Skew.saltedSum(df, "k", "v", col("row_id"))
        .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
      assert(saltedS.keySet == plainS.keySet)
      for ((k, v) <- plainS) assert(math.abs(saltedS(k) - v) < 1e-6)
    } finally df.unpersist()
  }

  test("salted join equals plain join on skewed key") {
    val s = spark
    import s.implicits._
    val dim = (0L until 97L).map(k => (k, s"name_$k")).toDF("k", "k_name")
    val plain = skewed.join(dim, "k").agg(count(lit(1)), sum("v"))
      .head()
    val salted = Skew.saltedJoin(skewed, dim, "k", col("row_id")).agg(count(lit(1)), sum("v"))
      .head()
    assert(plain.getLong(0) == salted.getLong(0))
    assert(math.abs(plain.getDouble(1) - salted.getDouble(1)) < 1e-6)
  }

  test("bucketed tables co-locate the join: no shuffle Exchange in the plan") {
    val orders = Tables.orders(spark, TestSpark.Sf0001)
    val customer = Tables.customer(spark, TestSpark.Sf0001)
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_customer")
    // the in-memory catalog forgets tables between JVMs but their managed
    // locations persist on disk — clear them or saveAsTable refuses
    for (t <- Seq("b_orders", "b_customer")) {
      val dir = new java.io.File(s"target/warehouse/$t")
      if (dir.exists()) {
        def rm(f: java.io.File): Unit = {
          if (f.isDirectory) f.listFiles().foreach(rm)
          f.delete()
        }
        rm(dir)
      }
    }
    orders.write.mode("overwrite").bucketBy(8, "o_custkey").sortBy("o_custkey")
      .saveAsTable("b_orders")
    customer.write.mode("overwrite").bucketBy(8, "c_custkey").sortBy("c_custkey")
      .saveAsTable("b_customer")
    // force SMJ so the bucket layout (not a broadcast) is what's under test
    val joined = spark.table("b_orders").hint("merge")
      .join(spark.table("b_customer"), col("o_custkey") === col("c_custkey"))
    val plan = joined.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange hashpartitioning"),
      s"bucketed join still shuffles:\n$plan")
    assert(joined.count() == orders.join(customer,
      col("o_custkey") === col("c_custkey")).count())
  }

  test("q_zorder_layout: every z-bucket confines BOTH dimensions to a 16-value envelope") {
    // z >> 8 fixes the top 4 interleaved bits of ub AND vb, so within a
    // bucket each dimension spans at most 16 consecutive values - the
    // min/max-pruning property that makes the layout skip files for
    // predicates on EITHER column.
    val rows = graft.SparkEntry.queries("q_zorder_layout")(spark, TestSpark.Sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))
    assert(rows.nonEmpty)
    rows.foreach { case (zb, n, minU, maxU, minV, maxV) =>
      assert(n > 0)
      assert(maxU - minU <= 15, s"bucket $zb ub envelope [$minU,$maxU] wider than 16")
      assert(maxV - minV <= 15, s"bucket $zb vb envelope [$minV,$maxV] wider than 16")
    }
  }
}
