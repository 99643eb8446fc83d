package graft.sources

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType
import org.scalatest.funsuite.AnyFunSuite

/** The DSv2 source's three contracts — range-split planning, filter-narrowed
  * planning, and column pruning — asserted directly on the connector classes
  * (no plan-string scraping), plus end-to-end determinism through the read
  * path.
  */
class PointGenSourceSpec extends AnyFunSuite {
  private lazy val spark = graft.TestSpark.spark

  private def ranges(scan: PointGenScan): Seq[(Long, Long)] =
    scan.planInputPartitions().toSeq.map { case PointGenRange(s, e, _) => (s, e) }

  test("planInputPartitions: contiguous, balanced, covers [0, rows) exactly") {
    val scan = new PointGenScan(0, 4001, 8, PointGen.Schema)
    val rs = ranges(scan)
    assert(rs.size == 8)
    // contiguity + coverage
    assert(rs.head._1 == 0 && rs.last._2 == 4001)
    rs.sliding(2).foreach { case Seq(a, b) => assert(a._2 == b._1); case _ => }
    // remainder spread one-per-partition from the front: sizes differ by <= 1
    val sizes = rs.map(r => r._2 - r._1)
    assert(sizes.max - sizes.min <= 1, s"unbalanced splits: $sizes")
  }

  test("id-range filters narrow the planned domain before splits are laid out") {
    import org.apache.spark.sql.sources.{GreaterThanOrEqual, LessThan, EqualTo}
    val b = new PointGenScanBuilder(4000, 8)
    val residual = b.pushFilters(Array(
      GreaterThanOrEqual("id", 500L), LessThan("id", 3500L), EqualTo("bucket", 3)))
    // every filter stays residual (Spark re-checks); only id ranges narrowed
    assert(residual.length == 3)
    assert(b.pushedFilters().length == 2)
    val rs = ranges(b.build().asInstanceOf[PointGenScan])
    assert(rs.head._1 == 500 && rs.last._2 == 3500,
      s"planned domain not narrowed by pushed id range: $rs")
    assert(rs.map(r => r._2 - r._1).sum == 3000)
  }

  test("column pruning reaches the reader schema") {
    val b = new PointGenScanBuilder(100, 2)
    b.pruneColumns(StructType(PointGen.Schema.filter(f => f.name == "x")))
    val scan = b.build().asInstanceOf[PointGenScan]
    assert(scan.readSchema().fieldNames.toSeq == Seq("x"))
    // and the full read path honors it
    val df = spark.read.format("graft.sources.PointGen")
      .option("rows", "100").option("partitions", "2").load().select("x")
    assert(df.schema.fieldNames.toSeq == Seq("x"))
    assert(df.count() == 100)
  }

  test("generated rows are a pure function of id (engine-independent md5 arithmetic)") {
    val df = spark.read.format("graft.sources.PointGen")
      .option("rows", "64").option("partitions", "3").load()
    val rows = df.orderBy("id").collect()
    assert(rows.length == 64)
    rows.foreach { r =>
      val id = r.getLong(0)
      assert(r.getDouble(1) == PointGen.coord("px:", id))
      assert(r.getDouble(2) == PointGen.coord("py:", id))
      assert(r.getInt(3) == (id % 16).toInt)
    }
    // partition count follows the option, rows arrive once each
    assert(df.rdd.getNumPartitions == 3)
    assert(rows.map(_.getLong(0)).toSeq == (0L until 64L))
  }

  test("end-to-end: filtered read plans only the narrowed ranges") {
    val df = spark.read.format("graft.sources.PointGen")
      .option("rows", "4000").option("partitions", "8").load()
      .filter(col("id") >= 500 && col("id") < 3500)
    assert(df.count() == 3000)
    // the scan description carries the narrowed range (visible in explain)
    val desc = df.queryExecution.executedPlan.toString
    assert(desc.contains("PointGen"), s"custom scan missing from plan:\n$desc")
  }
}
