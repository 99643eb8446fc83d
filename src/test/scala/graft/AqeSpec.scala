package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.{CoalescedPartitionSpec, PartialReducerPartitionSpec, SparkPlan}
import org.apache.spark.sql.execution.adaptive.{AQEShuffleReadExec, AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.joins.SortMergeJoinExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** AQE runtime re-planning, asserted on EXECUTED plans — the production
  * shuffle features the rest of the surface exercises only statically:
  *
  *   - skew-join splitting: q_salted_join handles skew by HAND (salting is
  *     the right tool when the skew is known at write time); this spec
  *     pins that Spark's native `spark.sql.adaptive.skewJoin` ALSO engages
  *     on this build, so an unforeseen hot key at 100 TB is split at
  *     runtime instead of pinning one executor for hours;
  *   - post-shuffle coalescing: at 1000 executors a 32k-partition shuffle
  *     of a small intermediate would otherwise schedule 32k near-empty
  *     tasks; AQE folds them to the advisory size at runtime.
  *
  * Both are asserted on the ADAPTIVE final plan after a real execution
  * (sparkPlan would show the static guess, not the re-plan). Materialized
  * stages are QueryStageExec LEAVES, so a plain collect never descends
  * into them — every assertion here uses the stage-descending collector.
  */
class AqeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  /** Final adaptive plan after executing `df`. */
  private def finalPlan(df: DataFrame): SparkPlan = {
    df.collect()
    df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p =>
        p.collectFirst { case a: AdaptiveSparkPlanExec => a.executedPlan }.getOrElse(p)
    }
  }

  /** collect that descends into materialized query stages (leaf nodes
    * whose subtree hangs off `.plan`, invisible to SparkPlan.collect).
    */
  private def collectDeep[T](p: SparkPlan)(pf: PartialFunction[SparkPlan, T]): Seq[T] =
    p.collect(pf) ++
      p.collect { case q: QueryStageExec => q.plan }.flatMap(collectDeep(_)(pf))

  private def withConfs(kvs: (String, String)*)(body: => Unit): Unit = {
    val old = kvs.map { case (k, _) => k -> spark.conf.getOption(k) }
    kvs.foreach { case (k, v) => spark.conf.set(k, v) }
    try body
    finally old.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }

  test("AQE splits a runtime-skewed sort-merge join (native skew handling engages)") {
    withConfs(
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "1",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "1KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "1KB",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1") {
      val ev = graft.core.Tables.events(spark, TestSpark.Sf0001)
      // runtime-skewed key: ~90% of rows collapse onto key 0 — the hot-key
      // shape salting guards against when it is KNOWN; here it is not.
      // The payload is a per-row sha2 digest so the hot partition's bytes
      // survive shuffle compression (a constant-key-only or repetitive
      // payload run-length-compresses under any threshold), and the 8-way
      // upstream repartition gives the shuffle multiple map tasks — AQE
      // can only split a skewed reducer partition at mapper boundaries.
      val left = ev.repartition(8)
        .withColumn("k",
          when(pmod(col("user_id"), lit(10)) < 9, lit(0L)).otherwise(col("user_id")))
        .withColumn("h", sha2(concat_ws("|", col("event_id"), col("ts")), 256))
        .select(col("k"), col("h"))
      // the probe side must be a PLAIN projection: OptimizeSkewedJoin only
      // matches Sort-over-shuffle-stage children, so a final aggregate
      // (e.g. distinct) directly under the join blocks the split — itself
      // a scale note worth pinning (SCALE.md: reduce the probe side in a
      // separate stage if the fact side may skew)
      val right = ev.select(col("user_id").as("k"), (col("user_id") * 2).as("payload"))
      val joined = left.join(right, "k")
        .select(sum(length(col("h")) * col("payload")).as("s"))
      val plan = finalPlan(joined)
      val smj = collectDeep(plan) { case s: SortMergeJoinExec => s }
      assert(smj.nonEmpty, s"expected a sort-merge join under AQE:\n$plan")
      assert(smj.exists(_.isSkewJoin),
        s"AQE did not mark the skewed SMJ (isSkewJoin=false) — native skew split regressed:\n$plan")
      // the skewed partition is physically split: the shuffle read carries
      // partial-reducer specs (several tasks reading slices of one reducer)
      val partials = collectDeep(plan) { case r: AQEShuffleReadExec => r }
        .flatMap(_.partitionSpecs)
        .collect { case p: PartialReducerPartitionSpec => p }
      assert(partials.length > 1,
        s"skewed partition was not split into partial-reducer slices:\n$plan")
    }
  }

  test("AQE coalesces post-shuffle partitions on q_join_equi forced off broadcast") {
    withConfs(
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "true",
      "spark.sql.adaptive.coalescePartitions.parallelismFirst" -> "false",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "64MB",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1") {
      // threshold off makes the dim join shuffle both sides (the 100 TB
      // shape when the dim outgrows the broadcast budget); at fixture size
      // AQE must then fold the tiny shuffle partitions together
      val df = SparkEntry.queries("q_join_equi")(spark, TestSpark.Sf0001)
      val plan = finalPlan(df)
      val reads = collectDeep(plan) { case r: AQEShuffleReadExec => r }
      assert(reads.nonEmpty, s"no AQE shuffle read in the adaptive plan:\n$plan")
      val coalesced = reads.flatMap(_.partitionSpecs).collect {
        case c: CoalescedPartitionSpec if c.endReducerIndex - c.startReducerIndex > 1 => c
      }
      assert(coalesced.nonEmpty,
        s"AQE did not coalesce the tiny post-shuffle partitions:\n$plan")
    }
  }
}
