package graft.queries

import org.scalatest.funsuite.AnyFunSuite

import graft.{SparkEntry, TestSpark}

/** Totality over degenerate inputs — the q_logrank lesson generalized: any
  * operator whose final aggregate sits above a filter that can empty the
  * frame must emit either ZERO rows or pinned non-NULL values, never a row
  * with NULL cells (a NULL that both engines replay identically passes the
  * hash gate while being semantically broken).
  *
  * The fixture here is adversarially minimal: events with a single user,
  * single non-purchase/click event type, single hour (empties the A/B
  * arms, the slope pair join, the level-1 split scan, and fully censors
  * the survival cohort); orders with only status 'P' (empties the F/O
  * two-sample frames and zeroes one AUC class).
  */
class DegenerateInputsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private lazy val dir: String = {
    val tmp = java.nio.file.Files.createTempDirectory("degen_fixture").toString
    import spark.implicits._
    val ts = java.sql.Timestamp.valueOf("2024-01-05 12:00:00")
    Seq((1L, ts, 7L, "scroll", 2.5, "{}"), (2L, ts, 7L, "scroll", 3.5, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$tmp/events.parquet")
    Seq((1L, 10L, "P", 100.25, "1994-01-02", "1-URGENT", "c1", 0L, "x"),
        (2L, 11L, "P", 310.75, "1994-02-03", "2-HIGH", "c2", 0L, "y"))
      .toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate", "o_orderpriority", "o_clerk", "o_shippriority", "o_comment")
      .write.mode("overwrite").parquet(s"$tmp/orders.parquet")
    // singleton strata: every source has n_h = 1 < 2, so every Neyman
    // weight is 0 — the zero-weight allocation plan
    Seq((1L, "alpha beta", "en", "webA", 10L), (2L, "gamma delta", "en", "webB", 11L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    tmp
  }

  // an EMPTY documents table (schema present, zero rows) — the n_true = 0
  // degenerate case for the capture–recapture error readout
  private lazy val emptyDocsDir: String = {
    val tmp = java.nio.file.Files.createTempDirectory("degen_empty").toString
    import spark.implicits._
    Seq.empty[(Long, String, String, String, Long)]
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    tmp
  }

  private def assertTotal(name: String): Unit = {
    val rows = SparkEntry.queries(name)(spark, dir).collect()
    rows.foreach { r =>
      (0 until r.length).foreach { i =>
        assert(!r.isNullAt(i),
          s"$name: NULL escaped in column ${r.schema.fieldNames(i)} of degenerate row $r")
      }
    }
  }

  for (q <- Seq("q_logrank", "q_ab_ttest", "q_ks_test", "q_auc",
                "q_theil_sen", "q_changepoint_binseg"))
    test(s"$q emits no NULL cells on the adversarially degenerate fixture") {
      assertTotal(q)
    }

  test("q_neyman_alloc: a zero-weight plan allocates 0 everywhere (budget not leaked)") {
    val rows = SparkEntry.queries("q_neyman_alloc")(spark, dir).collect()
    assert(rows.length == 2)
    rows.foreach { r =>
      assert(r.getAs[Long]("base") == 0L)
      assert(r.getAs[Long]("alloc") == 0L,
        s"zero-weight stratum ${r.getAs[String]("source")} got alloc ${r.getAs[Long]("alloc")}")
    }
  }

  test("q_capture_recapture: empty universe pins err_ppm to 0, no NULL/NaN escape") {
    val rows = SparkEntry.queries("q_capture_recapture")(spark, emptyDocsDir).collect()
    assert(rows.length == 1)
    val r = rows.head
    (0 until r.length).foreach(i => assert(!r.isNullAt(i),
      s"NULL escaped in ${r.schema.fieldNames(i)}"))
    assert(r.getAs[Long]("n_true") == 0L && r.getAs[Long]("err_ppm") == 0L)
  }
}
