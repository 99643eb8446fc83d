package graft.core

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Scalable global ordinals (1-based row numbers in a total order).
  *
  * A bare `row_number() OVER (ORDER BY k)` collapses to ONE partition —
  * correct, but a single-task bottleneck at scale. The scalable pattern is
  * `zipWithIndex` over a range-partitioned, partition-sorted layout: one
  * tiny job collects per-partition counts, then each partition numbers its
  * rows from its prefix-sum offset. Two narrow passes, no global sort, no
  * single task holding the table.
  *
  * This is one of the few justified RDD drops in the engine (per-partition
  * imperative logic that Catalyst cannot express): the DataFrame form of
  * the same idea re-samples range boundaries per job, which breaks offset
  * consistency — zipWithIndex shares one shuffle across both passes.
  *
  * Output = input columns + `rn` (BIGINT, 1-based in `orderCol` order).
  * The order key must be unique (it is a row id everywhere we use this).
  */
object Ordinals {

  def withGlobalRowNumbers(df: DataFrame, orderCol: String, numPartitions: Int = 0): DataFrame = {
    val spark = df.sparkSession
    val parts = if (numPartitions > 0) numPartitions
      else spark.sessionState.conf.numShufflePartitions
    val sorted = df.repartitionByRange(parts, col(orderCol)).sortWithinPartitions(orderCol)
    val indexed = sorted.rdd.zipWithIndex().map { case (row, i) =>
      Row.fromSeq(row.toSeq :+ (i + 1L))
    }
    spark.createDataFrame(indexed, sorted.schema.add("rn", LongType, nullable = false))
  }
}
