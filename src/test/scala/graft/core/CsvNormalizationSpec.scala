package graft.core

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.TestSpark

/** The reference normalizes its input file IN PLACE before parsing: every
  * `,x` becomes `, x` (regex `r',([^ ])' -> ', \1'`,
  * /root/reference/master.py:78-87 handlePoints), then lines split on
  * `', '`. q_split_cast exercises that regex on synthesized strings; this
  * spec feeds an ACTUALLY malformed CSV file through a real file read +
  * the same normalization, covering the file-in/file-out shape.
  */
class CsvNormalizationSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("malformed comma spacing normalizes and parses like the reference") {
    val dir = java.nio.file.Files.createTempDirectory("graft_malformed_csv")
    val f = dir.resolve("points.txt")
    // the three spacings the reference's regex must reconcile: none, one
    // space (already normal), and a negative value straight after a comma
    java.nio.file.Files.write(f, java.util.Arrays.asList(
      "1.5,2.25",
      "3.0, 4.5",
      "-5.25,-6.125"))
    val parsed = spark.read.text(f.toString)
      .select(transform(
        split(regexp_replace(col("value"), ",([^ ])", ", $1"), ", "),
        x => x.cast("double")).as("c"))
      .select(element_at(col("c"), 1).as("x"), element_at(col("c"), 2).as("y"))
      .collect().map(r => (r.getDouble(0), r.getDouble(1))).toSet
    assert(parsed == Set((1.5, 2.25), (3.0, 4.5), (-5.25, -6.125)))
    // no partial parses: a NULL here would mean the normalization missed a form
    val nulls = spark.read.text(f.toString)
      .select(transform(
        split(regexp_replace(col("value"), ",([^ ])", ", $1"), ", "),
        x => x.cast("double")).as("c"))
      .filter(exists(col("c"), _.isNull)).count()
    assert(nulls == 0)
  }
}
