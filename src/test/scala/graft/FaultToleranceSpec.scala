package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.TaskContext
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** The reference's fault-tolerance story — simulated worker failure with
  * synchronous restart (/root/reference/mapper.py:52-55, master.py:161-166)
  * — maps to Spark task re-attempts (`spark.task.maxFailures`). A UDF
  * throws on every task's FIRST attempt; results must equal the no-fault
  * run (SURVEY.md §5.4).
  */
class FaultToleranceSpec extends AnyFunSuite {

  test("task retry recovers from first-attempt failures with identical results") {
    val spark = TestSpark.spark // master local[4, 3] -> maxFailures=3
    import spark.implicits._
    val failOnce = udf { (x: Long) =>
      if (TaskContext.get().attemptNumber() == 0)
        throw new RuntimeException("simulated worker failure (p=1.0 on attempt 0)")
      x * 2
    }
    val df = (1L to 1000L).toDF("x").repartition(4)
    val got = df.select(sum(failOnce(col("x")))).head().getLong(0)
    assert(got == (1L to 1000L).map(_ * 2).sum)
  }
}
