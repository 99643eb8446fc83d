package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Round-13 stage-attribution probe for q_market_basket (bench #1): times
  * each pipeline stage separately in one JVM so the dominant cost is
  * identified before any further shape change. Dev tooling.
  */
object MbProbe {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .withExtensions(new graft.plans.GraftExtensions)
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config(graft.core.Tables.NanosAsLongConf._1, graft.core.Tables.NanosAsLongConf._2)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000).selectExpr("sum(id)").collect()

    def t(label: String)(f: => Long): Unit =
      for (i <- 1 to 2) {
        val t0 = System.nanoTime(); val n = f
        System.err.println(f"[mb] $label%-34s run$i ${(System.nanoTime() - t0) / 1e9}%6.2f s n=$n")
      }

    t("full query") {
      graft.SparkEntry.queries("q_market_basket")(spark, dir).count()
    }
    t("items ckpt (exchange+distinct)") {
      graft.core.Par.keyedExchange(
        graft.core.Tables.lineitem(spark, dir)
          .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk")), col("ok"))
        .distinct().localCheckpoint(eager = true).rdd.count()
    }
    val items = graft.core.Par.keyedExchange(
      graft.core.Tables.lineitem(spark, dir)
        .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk")), col("ok"))
      .distinct().localCheckpoint(eager = true)
    t("pair census (join+agg+filter)") {
      items.select(col("ok"), col("pk").as("pa"))
        .join(items.select(col("ok"), col("pk").as("pb")), "ok")
        .filter(col("pa") < col("pb"))
        .groupBy("pa", "pb").agg(count(lit(1)).as("n_ab"))
        .filter(col("n_ab") >= 2).count()
    }
    t("pair census NO broadcast") {
      items.select(col("ok"), col("pk").as("pa"))
        .hint("merge")
        .join(items.select(col("ok"), col("pk").as("pb")), "ok")
        .filter(col("pa") < col("pb"))
        .groupBy("pa", "pb").agg(count(lit(1)).as("n_ab"))
        .filter(col("n_ab") >= 2).count()
    }
    t("freq + nOrders") {
      items.groupBy("pk").agg(count(lit(1)).as("n_single")).count() +
        items.select("ok").distinct().agg(count(lit(1)).as("n_orders")).count()
    }
    spark.stop()
  }
}
