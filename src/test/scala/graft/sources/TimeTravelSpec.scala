package graft.sources

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{SparkEntry, TestSpark}

/** The snapshot/time-travel read surface: isolation (version 1 survives
  * the append byte-for-byte), append sharing (nothing rewritten), and
  * manifest-stats file pruning (the pruned file never reaches the scan).
  */
class TimeTravelSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("snapshot isolation: version 1 read AFTER the append equals the pre-append table") {
    val rows = SparkEntry.queries("q_time_travel")(spark, TestSpark.Sf0001)
      .orderBy("version").collect()
    assert(rows.length === 2)
    val (v1, v2) = (rows(0), rows(1))
    // expected: v1 = keys <= max/2 of orders, v2 = the whole table
    val o = graft.core.Tables.orders(spark, TestSpark.Sf0001)
    val x = o.agg(expr("max(o_orderkey) DIV 2")).collect()(0).getLong(0)
    val exp1 = o.filter(col("o_orderkey") <= x).count()
    val exp2 = o.count()
    assert(v1.getAs[Long]("n_rows") === exp1, "version 1 leaked appended rows")
    assert(v2.getAs[Long]("n_rows") === exp2)
    assert(v1.getAs[Long]("max_key") <= x, "version 1 sees keys above the split")
    assert(v2.getAs[Long]("max_key") > x)
    // the append added rows without touching v1's mass
    assert(v2.getAs[Long]("sum_cents") > v1.getAs[Long]("sum_cents"))
  }

  test("manifest pruning: the below-range file never reaches the parquet scan") {
    val df = SparkEntry.queries("q_manifest_prune")(spark, TestSpark.Sf0001)
    // inputFiles is the scan's real file list (the plan's Location string
    // truncates); the pruned half must not appear at all
    val files = df.inputFiles
    assert(files.exists(_.contains("snap_hi")), s"kept file missing: ${files.toSeq}")
    assert(!files.exists(_.contains("snap_lo")),
      s"pruned file still listed — file-level stats pruning regressed: ${files.toSeq}")
    val r = df.collect()(0)
    assert(r.getAs[Long]("n_files_total") === 2L)
    assert(r.getAs[Long]("n_files_scanned") === 1L)
    assert(r.getAs[Long]("n_rows") > 0L)
  }

  test("version 2 SHARES version 1's data file in the manifest (append rewrites nothing)") {
    val base = TimeTravel.build(spark, TestSpark.Sf0001)
    val m = spark.read
      .schema("version LONG, path STRING, min_key LONG, max_key LONG")
      .json(s"$base/manifest").collect()
    val v1Paths = m.filter(_.getLong(0) == 1L).map(_.getString(1)).toSet
    val v2Paths = m.filter(_.getLong(0) == 2L).map(_.getString(1)).toSet
    assert(v1Paths.subsetOf(v2Paths), "append must re-list v1's files, not rewrite them")
    assert(v2Paths.size === v1Paths.size + 1)
    // per-file stats are real envelopes: disjoint halves split at X
    val loMax = m.filter(r => r.getLong(0) == 2L && r.getString(1).contains("snap_lo"))
      .head.getLong(3)
    val hiMin = m.filter(r => r.getString(1).contains("snap_hi")).head.getLong(2)
    assert(loMax < hiMin, "file stats overlap — the prune would be unsound")
  }

  test("snapshot expiry: the compaction orphans exactly the pre-compaction halves") {
    import org.apache.spark.sql.functions._
    val df = SparkEntry.queries("q_snapshot_expire")(spark, TestSpark.Sf0001)
    // plan pin (the r11 scale-killer): the GC census is a PURE manifest
    // query — per-file row counts come from the manifest, so no data file
    // may reach any scan (the r11 shape read every data file)
    val dataFiles = df.inputFiles.filter(_.contains("/data/"))
    assert(dataFiles.isEmpty,
      s"expiry census must read ONLY the manifest, not data files: ${dataFiles.toSeq}")
    val rows = df.orderBy("file").collect()
    assert(rows.map(_.getAs[String]("file")).toSeq === Seq("snap_all", "snap_hi", "snap_lo"))
    val byFile = rows.map(r => r.getAs[String]("file") -> r).toMap
    assert(byFile("snap_all").getAs[Long]("live") === 1L)
    assert(byFile("snap_lo").getAs[Long]("live") === 0L)
    assert(byFile("snap_hi").getAs[Long]("live") === 0L)
    assert(byFile("snap_lo").getAs[Long]("n_versions") === 2L, "v1 AND v2 reference snap_lo")
    // conservation: the compacted file holds every row the orphans held
    assert(byFile("snap_all").getAs[Long]("n_rows") ===
      byFile("snap_lo").getAs[Long]("n_rows") + byFile("snap_hi").getAs[Long]("n_rows"))
    assert(byFile("snap_all").getAs[Long]("n_rows_freed") === 0L)
    assert(byFile("snap_lo").getAs[Long]("n_rows_freed") ===
      byFile("snap_lo").getAs[Long]("n_rows"))
  }

  test("manifest carries write-time row counts that conserve across the compaction") {
    val base = TimeTravel.build(spark, TestSpark.Sf0001)
    val m = spark.read
      .schema("version LONG, path STRING, min_key LONG, max_key LONG, n_rows LONG")
      .json(s"$base/manifest").collect()
    def nRows(frag: String) =
      m.filter(_.getString(1).contains(frag)).map(_.getLong(4)).distinct
    assert(nRows("snap_lo").length === 1, "shared file must list one count in every version")
    assert(nRows("snap_all").head === nRows("snap_lo").head + nRows("snap_hi").head,
      "compacted file must hold every row of the halves")
    val expected = graft.core.Tables.orders(spark, TestSpark.Sf0001).count()
    assert(nRows("snap_all").head === expected, "manifest count must match true file count")
  }

  test("snapshot changes: the CDF read scans ONLY the appended file") {
    val df = SparkEntry.queries("q_snapshot_changes")(spark, TestSpark.Sf0001)
    // plan pin: the manifest diff selects exactly the v2-added file; the
    // shared v1 file and the compaction file must never reach the scan
    val files = df.inputFiles
    assert(files.nonEmpty && files.forall(_.contains("snap_hi")),
      s"CDF read must scan only the appended file: ${files.toSeq}")
    val r = df.collect()(0)
    val o = graft.core.Tables.orders(spark, TestSpark.Sf0001)
    val x = o.agg(expr("max(o_orderkey) DIV 2")).collect()(0).getLong(0)
    assert(r.getAs[Long]("n_rows_added") === o.filter(col("o_orderkey") > x).count())
    assert(r.getAs[Long]("n_files_read") === 1L)
    assert(r.getAs[Long]("min_key") === x + 1)
  }

  test("totality: a 1-row table (empty lo half) builds, reads and prunes without error") {
    // max DIV 2 = 0 < the only key, so snap_lo is EMPTY: its manifest
    // entry must carry the inverted envelope and both queries stay total
    val tmp = java.nio.file.Files.createTempDirectory("tt_degen").toString
    import spark.implicits._
    Seq((1L, 10L, "P", 100.25, "1994-01-02", "1-URGENT", "c1", 0L, "x"))
      .toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate", "o_orderpriority", "o_clerk", "o_shippriority", "o_comment")
      .write.mode("overwrite").parquet(s"$tmp/orders.parquet")
    val tt = SparkEntry.queries("q_time_travel")(spark, tmp).orderBy("version").collect()
    assert(tt.length === 2)
    assert(tt(0).getAs[Long]("n_rows") === 0L, "v1 over the empty half must census 0")
    assert(tt(1).getAs[Long]("n_rows") === 1L)
    val mp = SparkEntry.queries("q_manifest_prune")(spark, tmp).collect()(0)
    assert(mp.getAs[Long]("n_rows") === 1L)
    assert(mp.getAs[Long]("n_files_scanned") === 1L, "the empty lo file must be pruned")
    // the maintenance reads stay total too: the empty half censuses 0
    val se = SparkEntry.queries("q_snapshot_expire")(spark, tmp).orderBy("file").collect()
    assert(se.map(r => r.getAs[String]("file") -> r.getAs[Long]("n_rows")).toMap ===
      Map("snap_all" -> 1L, "snap_hi" -> 1L, "snap_lo" -> 0L))
    val sc = SparkEntry.queries("q_snapshot_changes")(spark, tmp).collect()(0)
    assert(sc.getAs[Long]("n_rows_added") === 1L)
  }
}
