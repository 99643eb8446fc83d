package graft.tools

import org.apache.spark.sql.SparkSession

/** Round-13 probe for VERDICT #5 (TPC-H fixture-scale parallelism via
  * splittable input): lowering `spark.sql.files.maxPartitionBytes` can only
  * create more SPLITS, but a parquet split never subdivides a ROW GROUP —
  * on a single-row-group file the extra splits are empty. This prints, per
  * maxPartitionBytes setting, the planned partition count and the per-
  * partition row counts for the lineitem scan, settling whether the knob
  * can parallelize the fixture at all. Dev tooling.
  */
object SplitProbe {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Seq("128m", "1m", "64k").foreach { mpb =>
      spark.conf.set("spark.sql.files.maxPartitionBytes", mpb)
      val rdd = spark.read.parquet(s"$dir/lineitem.parquet")
        .selectExpr("l_orderkey").queryExecution.toRdd
      val counts = rdd.mapPartitions(it => Iterator.single(it.size)).collect()
      System.err.println(s"[split] maxPartitionBytes=$mpb planned=${counts.length} " +
        s"nonEmpty=${counts.count(_ > 0)} rows=${counts.toSeq.sorted.reverse.take(5).mkString(",")}")
    }
    spark.conf.set("spark.sql.files.maxPartitionBytes", "128m")

    // market-basket items frame: executed partition count of the
    // checkpointed (ok, pk) distinct under (a) the r12 AQE-coalescable
    // keyed exchange and (b) the r13 pinned keyedExchange
    import org.apache.spark.sql.functions.col
    val li = spark.read.parquet(s"$dir/lineitem.parquet")
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
    val oldItems = li.repartition(col("ok")).distinct().localCheckpoint(eager = true)
    System.err.println(s"[mb] r12 repartition(col): checkpointed partitions=${oldItems.rdd.getNumPartitions}")
    val newItems = graft.core.Par.keyedExchange(li, col("ok")).distinct().localCheckpoint(eager = true)
    System.err.println(s"[mb] r13 keyedExchange:     checkpointed partitions=${newItems.rdd.getNumPartitions}")
    spark.stop()
  }
}
