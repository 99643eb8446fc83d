package graft.plans

import org.scalatest.funsuite.AnyFunSuite

import graft.{SparkEntry, TestSpark}

/** The native as-of operator: plan shape, equivalence with the composable
  * union+window spelling, and the merge loop's edge semantics on
  * hand-built frames (ties, no-match, cross-key isolation).
  */
class AsOfJoinSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("q_join_asof_native plans through AsOfJoinExec with sorted co-partitioned inputs") {
    val df = SparkEntry.queries("q_join_asof_native")(spark, TestSpark.Sf0001)
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("AsOfJoin "), s"native operator not planned:\n$p")
    assert(p.contains("Sort [user_id") && p.contains("Sort [o_custkey"),
      s"EnsureRequirements added no within-partition sorts:\n$p")
    assert(p.contains("Exchange hashpartitioning(user_id") &&
      p.contains("Exchange hashpartitioning(o_custkey"),
      s"children not co-partitioned on the key:\n$p")
  }

  test("native as-of == union+window as-of on the fixture") {
    val native = SparkEntry.queries("q_join_asof_native")(spark, TestSpark.Sf0001).collect()
    val window = SparkEntry.queries("q_join_asof")(spark, TestSpark.Sf0001).collect()
    assert(native.length === window.length)
    native.zip(window).foreach { case (n, w) =>
      assert(n.getLong(0) === w.getLong(0))
      assert(Option(n.get(1)) === Option(w.get(1)), s"mismatch at event ${n.getLong(0)}")
    }
  }

  test("pre-bucketed inputs satisfy the declared distribution: no shuffle on either side") {
    // the reason AsOfJoin declares requirements instead of hand-rolling
    // zipPartitions: bucketed tables ALREADY satisfy ClusteredDistribution,
    // so EnsureRequirements inserts no Exchange — at 100 TB the as-of join
    // against a bucketed layout is shuffle-free, like any co-located SMJ
    import spark.implicits._
    val (lT, rT) = ("asof_left_bkt", "asof_right_bkt")
    Seq(lT, rT).foreach { t =>
      spark.sql(s"DROP TABLE IF EXISTS $t")
      // the in-memory catalog forgets tables between JVMs but the warehouse
      // dir persists; saveAsTable refuses an orphaned location
      val loc = new java.io.File(
        spark.conf.get("spark.sql.warehouse.dir").stripPrefix("file:"), t)
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) f.listFiles().foreach(rm)
        f.delete()
      }
      if (loc.exists()) rm(loc)
    }
    Seq((1L, 1L, 9L), (2L, 1L, 10L), (3L, 2L, 50L), (4L, 3L, 100L))
      .toDF("id", "k", "t")
      .write.bucketBy(4, "k").sortBy("k", "t").saveAsTable(lT)
    Seq((1L, 10L, 10L), (2L, 40L, 20L), (3L, 90L, 30L))
      .toDF("rk", "rt", "rv")
      .write.bucketBy(4, "rk").sortBy("rk", "rt").saveAsTable(rT)
    val joined = AsOfJoin(spark.table(lT), "k", "t",
      spark.table(rT), "rk", "rt", "rv", "v")
    val p = joined.queryExecution.executedPlan.toString
    assert(p.contains("AsOfJoin "), s"native operator not planned:\n$p")
    assert(!p.contains("Exchange hashpartitioning"),
      s"bucketed inputs still shuffled:\n$p")
    val got = joined.orderBy("id").select("id", "v").collect()
      .map(r => r.getLong(0) -> Option(r.get(1)))
    assert(got.toSeq === Seq(1L -> None, 2L -> Some(10L), 3L -> Some(20L), 4L -> Some(30L)))
  }

  test("null semantics: null left key/time match nothing; null right key/time/value rows are skipped") {
    // a null must never unbox to 0L and spuriously match key 0 / time 0
    val left = Seq(
      (1L, Some(0L), Some(10L)),  // real key 0 — must match right key 0
      (2L, None, Some(10L)),      // null key -> null value, row preserved
      (3L, Some(0L), None),       // null time -> null value, row preserved
      (4L, Some(1L), Some(10L))   // right side for key 1 is all-null -> null
    ).toDF("id", "k", "t")
    val right = Seq(
      (Some(0L), Some(5L), Some(7L)),   // the legitimate key-0 match
      (None, Some(1L), Some(99L)),      // null key: skipped
      (Some(0L), None, Some(98L)),      // null time: skipped
      (Some(1L), Some(1L), None)        // null value: skipped
    ).toDF("rk", "rt", "rv")
    val got = AsOfJoin(left, "k", "t", right, "rk", "rt", "rv", "v")
      .orderBy("id").select("id", "v").collect()
      .map(r => r.getLong(0) -> Option(r.get(1)))
    assert(got.toSeq === Seq(
      1L -> Some(7L), 2L -> None, 3L -> None, 4L -> None))
  }

  test("last-non-null-value semantics: a later NULL-payload row does not mask an earlier value") {
    // Pins the documented divergence from DuckDB/pandas ASOF: a NULL-value
    // right row at the latest qualifying time is SKIPPED and the earlier
    // non-null value carries forward (matching q_join_asof's
    // `last(value, ignoreNulls=true)` window spelling), rather than
    // matching and yielding NULL.
    val left = Seq(
      (1L, 1L, 25L),  // after (t=10, v=7) and (t=20, v=NULL) -> 7, not NULL
      (2L, 1L, 15L)   // between: only (t=10, v=7) qualifies -> 7
    ).toDF("id", "k", "t")
    val right = Seq(
      (1L, 10L, Some(7L)),
      (1L, 20L, None)     // latest qualifying row for id=1, NULL payload
    ).toDF("rk", "rt", "rv")
    val got = AsOfJoin(left, "k", "t", right, "rk", "rt", "rv", "v")
      .orderBy("id").select("id", "v").collect()
      .map(r => r.getLong(0) -> Option(r.get(1)))
    assert(got.toSeq === Seq(1L -> Some(7L), 2L -> Some(7L)))
  }

  test("merge semantics: time ties take the largest value; no earlier right row -> null; keys isolated") {
    val left = Seq(
      (1L, 1L, 9L),   // before any right row for key 1 -> null
      (2L, 1L, 10L),  // tie on t=10 -> larger value wins (20)
      (3L, 1L, 50L),  // after all -> latest (30)
      (4L, 2L, 100L)  // key 2 has no right rows -> null (no cross-key leak)
    ).toDF("id", "k", "t")
    val right = Seq(
      (1L, 10L, 10L), (1L, 10L, 20L), (1L, 11L, 30L)
    ).toDF("rk", "rt", "rv")
    val got = AsOfJoin(left, "k", "t", right, "rk", "rt", "rv", "v")
      .orderBy("id").select("id", "v").collect()
      .map(r => r.getLong(0) -> Option(r.get(1)))
    assert(got.toSeq === Seq(
      1L -> None, 2L -> Some(20L), 3L -> Some(30L), 4L -> None))
  }

  test("skew: one key owning 200k right / 50k left rows merges correctly in O(1) state") {
    // The scale claim under test: ALL of a hot key's rows land in one
    // partition (ClusteredDistribution), but the merge holds exactly one
    // saved (key, value) pair + a one-row lookahead — the skew cost is
    // borne by the spill-capable SortExec below, never by operator state.
    // Hot key 7: right rows (rt = 1..200000, rv = rt); left rows t = 4i,
    // so the expected match is rv == t exactly. Cold key 9 rides the same
    // run to prove the saved-pair state does not leak across keys inside
    // the shared partition stream.
    import org.apache.spark.sql.functions._
    val left = spark.range(1, 50001)
      .select(col("id").as("lid"), lit(7L).as("k"), (col("id") * 4).as("t"))
      .union(spark.range(1, 101)
        .select((col("id") + 100000).as("lid"), lit(9L).as("k"), (col("id") * 2).as("t")))
      .toDF("lid", "k", "t")
    val right = spark.range(1, 200001)
      .select(lit(7L).as("rk"), col("id").as("rt"), col("id").as("rv"))
      .union(spark.range(1, 1001)
        .select(lit(9L).as("rk"), (col("id") * 2).as("rt"), col("id").as("rv")))
      .toDF("rk", "rt", "rv")
    val out = AsOfJoin(left, "k", "t", right, "rk", "rt", "rv", "v")
    val bad = out.filter(
      (col("k") === 7 && (col("v").isNull || col("v") =!= col("t"))) ||
      (col("k") === 9 && (col("v").isNull || col("v") =!= col("t") / 2))).count()
    assert(bad === 0L, "hot-key or cold-key as-of matches wrong under skew")
    assert(out.count() === 50100L)
  }
}
