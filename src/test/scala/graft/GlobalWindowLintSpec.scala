package graft

import org.apache.spark.sql.execution._
import org.apache.spark.sql.execution.aggregate.{HashAggregateExec, ObjectHashAggregateExec, SortAggregateExec}
import org.apache.spark.sql.execution.window.{WindowExec, WindowGroupLimitExec}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Machine check for the bounded-global-window discipline (the r8
  * scale-killer class): a `Window` with an EMPTY partition spec funnels its
  * entire input frame through ONE task — legitimate only when that frame is
  * provably bounded. Until now this was convention policed by review; this
  * lint walks EVERY registered query's physical plan and fails the build if
  * a partition-less window sits over anything unbounded.
  *
  * A partition-less window is accepted iff every leafward path below it
  * terminates (before reaching a file scan / Range) at:
  *   - a limit-like node (TakeOrderedAndProject / Global/Local/CollectLimit)
  *     — bounded unconditionally, any k rows; or
  *   - an aggregate / literal local table / checkpointed RDD scan — bounded
  *     ONLY by a documented domain argument, so the query must appear in
  *     the whitelist below with its one-line justification.
  *
  * The canary test proves the lint bites: a bare global rank over the raw
  * documents table must be flagged.
  */
class GlobalWindowLintSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  /** Query keys whose partition-less windows ride on aggregate (or
    * checkpoint-hidden) frames with a BOUNDED grouping domain. Adding a key
    * here is a reviewed claim: state the domain and why it cannot scale
    * with the data. The Int pins the number of partition-less windows the
    * plan had at whitelist time — a later edit that adds MORE global
    * windows to a whitelisted query fails the lint instead of riding the
    * existing waiver.
    */
  private val BoundedDomainWhitelist: Map[String, (Int, String)] = Map(
    "q_auc" -> (1, "per-distinct-score census: 2-decimal price domain bounds the frame, not N"),
    "q_bh_fdr" -> (4, "5-row event_type segment family (bounded test family)"),
    "q_changepoint" -> (2, "hourly event-count series: calendar hours, not events"),
    "q_chi_square" -> (1, "5x5 segment x priority contingency table"),
    "q_concurrency" -> (1, "carry-in totals over the calendar-bounded hour frame"),
    "q_cramers_v" -> (1, "same 25-row contingency reduction as q_chi_square"),
    "q_cross_fold" -> (1, "per-fold census: k=5 fold rows"),
    "q_curriculum" -> (1, "fixed 100-char length stages: <=6 stage rows"),
    "q_disorder_census" -> (1, "(disorder-minute -> count) histogram bounded by the disorder span"),
    "q_drawdown" -> (2, "calendar-bounded daily cumulative series"),
    "q_elbow_scan" -> (1, "5-row SSE(k) curve, k = 1..K"),
    "q_epoch_plan" -> (2, "both windows (row_number + cumsum) walk the per-SOURCE token frame: source registry, data-independent"),
    "q_gains_table" -> (1, "fixed 10-row decile frame"),
    "q_gini_concentration" -> (1, "source-registry frame (thousands at most, never documents)"),
    "q_grid_search" -> (2, "window 1 sits above an explicit .limit(10); window 2 ranks the 4-row literal (k1,b) config frame"),
    "q_heaps_law" -> (2, "10 doc-id prefix checkpoints (terms carry only their first bucket)"),
    "q_histo_quantile_merge" -> (2, "log-histogram buckets + distinct-value census eval side"),
    "q_ks_test" -> (2, "fixed-width price bins: <=~600 (bin, side-count) rows"),
    "q_lorenz_points" -> (1, "source-registry frame after one source aggregate"),
    "q_mannwhitney" -> (1, "$1000 price bins: bounded value domain, ranks over bins"),
    "q_neyman_alloc" -> (1, "source-registry stratum frame (remainder rank over ~20 rows)"),
    "q_pr_curve" -> (2, "fixed 10-bin score histogram (ppm-grid thresholds)"),
    "q_range_boundaries" -> (1, "$10k price buckets: ~60 distinct at any corpus size"),
    "q_roc_points" -> (2, "same 10-bin histogram as q_pr_curve"),
    "q_rolling_corr" -> (1, "one row per hour (map-side-combined) before the 24h window"),
    "q_skew_census" -> (1, "(frequency -> count) histogram double collapse (plan-pinned)"),
    "q_skyline" -> (2, "bucket staircase: ~500 $1k price buckets; exact pass: candidates bounded by the 2-decimal CENTS domain per bucket (<=1e5/bucket, data-independent), empirically ~1e2-1e3"),
    "q_survival_km" -> (3, "31-day lifetime grid (capped day domain)"),
    "q_tree_split" -> (1, "bounded candidate-split frame after the combinable aggregate"),
    "q_ucb_plan" -> (1, "5-row arm frame argmax"),
    "q_uplift_deciles" -> (1, "fixed 10-row decile frame (20-cell aggregate)"),
    "q_vocab_coverage" -> (1, "(count -> n_words) distinct-frequency histogram"),
    "q_wilcoxon_signed" -> (1, "centi |diff| bin census: bounded value domain"),
    "q_wilson_rank" -> (1, "per-item frame from one combinable aggregate (bounded item domain)")
  )

  private def isLimitLike(p: SparkPlan): Boolean = p match {
    case _: TakeOrderedAndProjectExec | _: GlobalLimitExec |
         _: LocalLimitExec | _: CollectLimitExec => true
    case _ => false
  }
  private def isAggregate(p: SparkPlan): Boolean = p match {
    case _: HashAggregateExec | _: ObjectHashAggregateExec |
         _: SortAggregateExec => true
    case _ => false
  }
  // literal frames (createDataFrame of a Seq) and localCheckpoint
  // materializations: bounded only by construction, so whitelist-gated
  private def isOpaqueBoundedScan(p: SparkPlan): Boolean = p match {
    case _: LocalTableScanExec => true
    case _: RDDScanExec => true
    case _ => p.nodeName.contains("ExistingRDD")
  }

  /** Classify every leafward termination below `p`: "limit", "agg",
    * "opaque", or "UNBOUNDED:<node>" when a path reaches a raw scan.
    */
  private def terminators(p: SparkPlan): Seq[String] = p match {
    case l if isLimitLike(l)         => Seq("limit")
    case a if isAggregate(a)         => Seq("agg")
    case s if isOpaqueBoundedScan(s) => Seq("opaque")
    case leaf if leaf.children.isEmpty => Seq(s"UNBOUNDED:${leaf.nodeName}")
    case other => other.children.flatMap(terminators)
  }

  /** All physical plans reachable from `df`: the root plan plus every
    * subquery plan (scalar / IN / EXISTS expressions that survive
    * optimization keep their own logical subtree — a partition-less window
    * hidden inside one never appears in the root's children walk, so each
    * is compiled and linted independently).
    */
  private def physicalPlans(df: org.apache.spark.sql.DataFrame): Seq[SparkPlan] = {
    import org.apache.spark.sql.catalyst.expressions.SubqueryExpression
    import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
    def subs(lp: LogicalPlan): Seq[LogicalPlan] = {
      val direct = lp.collect { case n =>
        n.expressions.flatMap(_.collect { case se: SubqueryExpression => se.plan })
      }.flatten
      direct ++ direct.flatMap(subs)
    }
    df.queryExecution.sparkPlan +:
      subs(df.queryExecution.optimizedPlan).map(lp =>
        org.apache.spark.sql.graftbridge.ofRows(spark, lp).queryExecution.sparkPlan)
  }

  private def globalWindows(plan: SparkPlan): Seq[SparkPlan] = plan.collect {
    case w: WindowExec if w.partitionSpec.isEmpty           => w
    case w: WindowGroupLimitExec if w.partitionSpec.isEmpty => w
  }

  /** Lint one query's plans; returns human-readable violations. */
  private def lint(name: String, plans: Seq[SparkPlan]): Seq[String] = {
    val windows = plans.flatMap(globalWindows)
    val perWindow = windows.flatMap { w =>
      val terms = terminators(w.children.head).distinct
      val unbounded = terms.filter(_.startsWith("UNBOUNDED"))
      if (unbounded.nonEmpty)
        Some(s"$name: partition-less ${w.nodeName} over an unbounded frame " +
          s"(${unbounded.mkString(", ")})")
      else if (terms.exists(t => t == "agg" || t == "opaque") &&
               !BoundedDomainWhitelist.contains(name))
        Some(s"$name: partition-less ${w.nodeName} bounded only by an " +
          "aggregate/checkpoint frame — add a justified whitelist entry")
      else None
    }
    val growth = BoundedDomainWhitelist.get(name) match {
      case Some((allowed, _)) if windows.length > allowed =>
        Seq(s"$name: ${windows.length} partition-less windows, whitelist " +
          s"pinned $allowed — re-review the new window(s) and re-pin")
      case _ => Nil
    }
    perWindow ++ growth
  }
  private def lint(name: String, plan: SparkPlan): Seq[String] = lint(name, Seq(plan))

  test("no registered query runs a partition-less window over an unbounded frame") {
    val violations = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, q) => lint(name, physicalPlans(q(spark, TestSpark.Sf0001)))
    }
    assert(violations.isEmpty,
      s"${violations.length} global-window violations:\n${violations.mkString("\n")}")
  }

  test("q_rfm has NO partition-less window (broadcast quantile boundaries, not ntile)") {
    val plans = physicalPlans(SparkEntry.queries("q_rfm")(spark, TestSpark.Sf0001))
    assert(plans.flatMap(globalWindows).isEmpty,
      "q_rfm regressed to a global-sort quintile plan")
  }

  test("canary: a bare global rank over raw documents IS flagged") {
    import org.apache.spark.sql.expressions.Window
    val df = graft.core.Tables.documents(spark, TestSpark.Sf0001)
      .withColumn("rk", row_number().over(Window.orderBy(col("n_chars"))))
    val v = lint("canary", df.queryExecution.sparkPlan)
    assert(v.nonEmpty, "the lint must flag a bare global rank over a raw table scan")
    assert(v.head.contains("unbounded"), v.head)
  }

  test("canary: the same rank AFTER a limit passes") {
    import org.apache.spark.sql.expressions.Window
    val df = graft.core.Tables.documents(spark, TestSpark.Sf0001)
      .orderBy(col("n_chars")).limit(50)
      .withColumn("rk", row_number().over(Window.orderBy(col("n_chars"))))
    assert(lint("canary_ok", df.queryExecution.sparkPlan).isEmpty)
  }

  test("canary: a global rank HIDDEN IN A SCALAR SUBQUERY is flagged") {
    graft.core.Tables.documents(spark, TestSpark.Sf0001)
      .createOrReplaceTempView("lint_docs_v")
    val df = spark.sql(
      """SELECT doc_id FROM lint_docs_v
        |WHERE n_chars > (SELECT max(rk) FROM
        |  (SELECT row_number() OVER (ORDER BY n_chars) AS rk FROM lint_docs_v))""".stripMargin)
    val v = lint("canary_subq", physicalPlans(df))
    assert(v.nonEmpty, "the lint must flag a global rank inside a scalar subquery")
    assert(v.head.contains("unbounded"), v.head)
  }
}
