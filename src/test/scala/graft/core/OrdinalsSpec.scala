package graft.core

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.TestSpark

/** Global ordinals must equal a single-partition row_number while actually
  * running across multiple range partitions.
  */
class OrdinalsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("matches single-partition row_number on shuffled input") {
    val s = spark
    import s.implicits._
    val rng = new scala.util.Random(11)
    val ids = rng.shuffle((1L to 5000L).toList)
    val df = ids.map(i => (i, i * 3)).toDF("id", "payload").repartition(8)

    val expected = df.select(col("id"),
      row_number().over(Window.orderBy("id")).cast("long").as("rn"))
    val got = Ordinals.withGlobalRowNumbers(df, "id", numPartitions = 8)
      .select("id", "rn")
    assert(got.exceptAll(expected).isEmpty && expected.exceptAll(got).isEmpty)
  }

  test("runs across multiple partitions (not a single-task sort)") {
    val s = spark
    import s.implicits._
    val df = (1L to 1000L).map(i => Tuple1(i)).toDF("id")
    val parts = Ordinals.withGlobalRowNumbers(df, "id", numPartitions = 6)
      .select(spark_partition_id()).distinct().count()
    assert(parts > 1, "ordinal assignment collapsed to one partition")
  }
}
