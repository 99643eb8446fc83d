package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .withExtensions(new graft.plans.GraftExtensions)
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Profiling mode: `runMain graft.Bench q_x q_y` times each named query
    // twice (cold/warm) and dumps the formatted physical plan.
    if (args.nonEmpty) {
      args.foreach { name =>
        val fn = SparkEntry.queries(name)
        println(s"=== $name ===")
        println(fn(spark, sfDir).queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode))
        for (run <- 1 to 2) {
          val t0 = System.nanoTime()
          fn(spark, sfDir).count()
          println(f"$name run$run: ${(System.nanoTime() - t0) / 1e9}%.2f s")
        }
      }
      spark.stop()
      return
    }
    // untimed session warm-up (codegen machinery + parquet reader init), so
    // the first timed query isn't charged several seconds of JVM start
    spark.range(1000).selectExpr("sum(id)").collect()
    spark.read.parquet(s"$sfDir/region.parquet").count()
    // sorted: stable run order -> comparable per-query numbers across rounds
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).count() } catch { case _: Throwable => -1L }
      name -> (System.nanoTime() - t0) / 1e9
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.map(_._2).sum else 0.0
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
