package graft.tools

import org.apache.spark.sql.SparkSession

/** Round-13 probe for VERDICT #6 (iterative job-floor reduction): times
  * each named query under the shared session vs a child session with AQE
  * disabled (fewer per-round stage barriers / re-plans on fixpoint loops).
  * min-of-2 per variant, interleaved, one JVM. Dev tooling.
  */
object AqeFloorProbe {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .withExtensions(new graft.plans.GraftExtensions)
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config(graft.core.Tables.NanosAsLongConf._1, graft.core.Tables.NanosAsLongConf._2)
      .config("spark.sql.warehouse.dir", "target/warehouse")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000).selectExpr("sum(id)").collect()

    val noAqe = spark.newSession()
    noAqe.conf.set("spark.sql.adaptive.enabled", "false")

    val keys = if (args.nonEmpty) args.toSeq
      else Seq("q_graph_bfs", "q_tree_depth2", "q_coreset_fps", "q_hits_rank",
        "q_label_prop", "q_median_polish", "q_pagerank", "q_kcore",
        "q_changepoint_binseg")

    keys.foreach { name =>
      val fn = graft.SparkEntry.queries(name)
      def t(s: SparkSession): Double = {
        val t0 = System.nanoTime(); fn(s, dir).count(); (System.nanoTime() - t0) / 1e9
      }
      // interleave to decorrelate from box drift; min-of-2 each
      val a1 = t(spark); val b1 = t(noAqe); val a2 = t(spark); val b2 = t(noAqe)
      val (a, b) = (math.min(a1, a2), math.min(b1, b2))
      System.err.println(f"[aqe] $name%-24s aqe=$a%6.2f s  noaqe=$b%6.2f s  ratio=${b / a}%5.2f")
    }
    spark.stop()
  }
}
