package graft

import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.execution.exchange.BroadcastExchangeExec
import org.scalatest.funsuite.AnyFunSuite

/** Machine check for the r11 q_substring_dup defect class: an EXPLICIT
  * `broadcast()` hint on a frame that scales with the data is a plan that
  * works at fixture stats and OOMs at 100 TB — and unlike a planner-chosen
  * broadcast (which flips to a shuffle join when real statistics arrive),
  * a hint OVERRIDES statistics, so it can never save itself at scale.
  *
  * A hinted build side is accepted iff every path below the hint bounds
  * the frame:
  *   - a limit node — bounded unconditionally;
  *   - an aggregate with NO grouping keys (1-row scalar frames) or with
  *     no data-scaled grouping key (cluster ids, calendar buckets,
  *     registry keys, value-domain bins) — the house broadcast shapes;
  *   - a literal/checkpointed local frame;
  *   - a raw scan of a TPC-H DIM table (the documented small-dim
  *     convention; region/nation are spec-fixed, customer-grade dims
  *     scale far slower than facts and their broadcasts carry selective
  *     filters).
  * Flagged: an aggregate grouped by a data-scaled id, or a raw scan of a
  * fact/corpus table (lineitem, orders, events, documents, embeddings).
  *
  * r12 closes the two growth holes the r11 shape left open:
  *   - whitelist entries now PIN the hinted-broadcast count (like
  *     GlobalWindowLintSpec's window counts), so a later edit cannot ride
  *     an existing waiver with a second, genuinely data-scaled hint;
  *   - a forced-threshold sweep plans every query with
  *     autoBroadcastJoinThreshold = -1 and lints every broadcast exchange
  *     that SURVIVES. With auto-broadcast off, a surviving exchange is
  *     structural — a hint, or a non-equi/cross join that MUST broadcast
  *     one side (BroadcastNestedLoopJoin) regardless of size. The latter
  *     is exactly the planner-chosen shape that passes silently at
  *     fixture stats and OOMs at 100 TB, because no statistics update can
  *     ever flip a nested-loop join's broadcast away.
  */
class BroadcastDomainLintSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val DataScaledKey =
    """(?i)^(doc_id|user_id|vec_id|event_id|o_orderkey|l_orderkey|o_custkey|c_custkey|p_partkey|s_suppkey|l_partkey|l_suppkey|gram|shingle)$""".r

  private val FactTables = Seq("lineitem", "orders", "events", "documents", "embeddings")

  /** query -> (pinned hinted-broadcast side count, one-line domain bound)
    * waivers for flagged-but-bounded build sides. Adding a key — or
    * growing a pinned count — is a reviewed claim, as in
    * GlobalWindowLintSpec.
    */
  private val Whitelist: Map[String, (Int, String)] = Map(
    "q_knn_join" -> (1, "hinted side is the <=5-row vec_id<5 probe set (filter below the hint)"),
    "q_mrl_trunc" -> (1, "same <=5-row probe-set shape as q_knn_join")
    // q_topk_similar (whitelisted in r11) carries NO hint — its probe is a
    // literal array, not a joined frame — so the r12 pin audit dropped it
  )

  private def groupNames(a: Aggregate): Seq[String] =
    a.groupingExpressions.flatMap(_.references.map(_.name))

  /** First bounding node wins on each path below the hinted side. */
  private def check(p: LogicalPlan): Seq[String] = p match {
    case _: GlobalLimit | _: LocalLimit => Nil
    case a: Aggregate =>
      val bad = groupNames(a).filter(n => DataScaledKey.findFirstIn(n).isDefined)
      if (bad.nonEmpty) Seq(s"broadcast of an aggregate grouped by data-scaled ${bad.distinct.mkString(",")}")
      else Nil
    case _: LocalRelation => Nil
    case l if l.children.isEmpty =>
      // logical leaf toString elides the path; read it off the relation
      val paths = l match {
        case lr: org.apache.spark.sql.execution.datasources.LogicalRelation =>
          lr.relation match {
            case h: org.apache.spark.sql.execution.datasources.HadoopFsRelation =>
              h.location.rootPaths.map(_.toString)
            case _ => Nil
          }
        case _ => Nil
      }
      FactTables.find(t => paths.exists(_.contains(s"$t.parquet")))
        .map(t => s"broadcast of a raw $t scan").toSeq
    case other => other.children.flatMap(check)
  }

  private def hintedSides(plan: LogicalPlan): Seq[LogicalPlan] =
    plan.collect { case j: Join =>
      Seq(j.hint.leftHint -> j.left, j.hint.rightHint -> j.right).collect {
        case (Some(h), side) if h.strategy.contains(BROADCAST) => side
      }
    }.flatten

  private def lint(name: String, plan: LogicalPlan): Seq[String] = {
    val sides = hintedSides(plan)
    Whitelist.get(name) match {
      case Some((pinned, _)) =>
        // the waiver covers EXACTLY the reviewed count — a new hint on a
        // whitelisted query must re-justify itself here
        if (sides.length == pinned) Nil
        else Seq(s"$name: ${sides.length} hinted broadcast sides (whitelist pins $pinned) — " +
          "new hints cannot ride an existing waiver")
      case None =>
        sides.flatMap(side => check(side).map(v => s"$name: hinted $v"))
    }
  }

  test("no registered query HINT-broadcasts a data-scaled frame") {
    val violations = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, q) =>
        lint(name, q(spark, TestSpark.Sf0001).queryExecution.optimizedPlan)
    }
    assert(violations.isEmpty,
      s"${violations.length} broadcast-domain violations:\n${violations.mkString("\n")}")
  }

  /** Lint every broadcast exchange that survives auto-broadcast OFF. The
    * walk runs on the EXECUTED plan (exchanges are inserted by
    * EnsureRequirements during preparation — sparkPlan has none), with
    * AQE disabled so the prepared plan is the final static plan; the
    * physical node's logicalLink recovers the build side's logical
    * subplan, so the same bounded-domain walk applies. A query whose
    * DataFrame executes eagerly during CONSTRUCTION (Lloyd loops,
    * streaming replays) is still covered: construction happens under the
    * forced threshold too.
    */
  private def forcedBroadcastViolations(name: String,
      q: (org.apache.spark.sql.SparkSession, String) => org.apache.spark.sql.DataFrame): Seq[String] = {
    val plan = q(spark, TestSpark.Sf0001).queryExecution.executedPlan
    val exchanges = plan.collect { case b: BroadcastExchangeExec => b }
    // codegen wraps the build side in WholeStageCodegen nodes that carry
    // no logicalLink; the first linked node below the exchange (pre-order,
    // so the widest subplan) recovers the logical build side
    val sides = exchanges.flatMap(b =>
      b.collectFirst { case n if n.logicalLink.isDefined => n.logicalLink.get })
    Whitelist.get(name) match {
      case Some((pinned, _)) =>
        if (exchanges.length <= pinned) Nil
        else Seq(s"$name: ${exchanges.length} surviving broadcast exchanges (whitelist pins $pinned)")
      case None =>
        // an unlinkable exchange cannot be proven bounded — flag it
        (if (sides.length < exchanges.length)
          Seq(s"$name: broadcast exchange with no logical link (cannot prove bounded)")
        else Nil) ++
          sides.flatMap(lp => check(lp).map(v => s"$name: threshold-proof $v"))
    }
  }

  private def withForcedThreshold(body: => Unit): Unit = {
    val kvs = Seq("spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.enabled" -> "false")
    val old = kvs.map { case (k, _) => k -> spark.conf.getOption(k) }
    kvs.foreach { case (k, v) => spark.conf.set(k, v) }
    try body
    finally old.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }

  test("forced-threshold sweep: every broadcast surviving autoBroadcast=-1 is domain-bounded") {
    withForcedThreshold {
      val violations = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
        case (name, q) => forcedBroadcastViolations(name, q)
      }
      assert(violations.isEmpty,
        s"${violations.length} threshold-proof broadcast violations:\n${violations.mkString("\n")}")
    }
  }

  test("sweep is not vacuous: hinted broadcasts DO surface as exchanges under the forced threshold") {
    withForcedThreshold {
      // q_knn_join's hinted probe-side broadcast must survive threshold=-1
      // and be visible to the sweep's exchange collector (if this fails,
      // the sweep is walking a plan stage without exchanges)
      val plan = SparkEntry.queries("q_knn_join")(spark, TestSpark.Sf0001)
        .queryExecution.executedPlan
      val n = plan.collect { case b: BroadcastExchangeExec => b }.length
      assert(n === 1, s"expected exactly the one hinted broadcast exchange, saw $n:\n$plan")
    }
  }

  test("canary: hint-broadcasting a per-user aggregate of events IS flagged") {
    import org.apache.spark.sql.functions._
    val ev = graft.core.Tables.events(spark, TestSpark.Sf0001)
    val perUser = ev.groupBy("user_id").agg(count(lit(1)).as("n"))
    val df = ev.join(broadcast(perUser), "user_id")
    val v = lint("canary", df.queryExecution.optimizedPlan)
    assert(v.nonEmpty, "the lint must flag a hinted broadcast of a per-user frame")
    assert(v.head.contains("user_id"), v.head)
  }

  test("canary: hint-broadcasting a raw events scan IS flagged") {
    import org.apache.spark.sql.functions._
    val ev = graft.core.Tables.events(spark, TestSpark.Sf0001)
    val df = ev.crossJoin(broadcast(ev.select("user_id")))
    val v = lint("canary_raw", df.queryExecution.optimizedPlan)
    assert(v.nonEmpty, "the lint must flag a hinted broadcast of a raw fact scan")
  }

  test("canary: hint-broadcasting a 1-row global aggregate passes") {
    import org.apache.spark.sql.functions._
    val ev = graft.core.Tables.events(spark, TestSpark.Sf0001)
    val tmax = ev.agg(max("ts").as("t_max"))
    val df = ev.crossJoin(broadcast(tmax))
    assert(lint("canary_ok", df.queryExecution.optimizedPlan).isEmpty)
  }

  test("canary: a whitelisted query growing a SECOND hint IS flagged (pin enforcement)") {
    import org.apache.spark.sql.functions._
    val ev = graft.core.Tables.events(spark, TestSpark.Sf0001)
    val a = ev.groupBy("user_id").agg(count(lit(1)).as("n"))
    val df = ev.join(broadcast(a), "user_id")
      .crossJoin(broadcast(ev.agg(max("ts").as("t_max"))))
    // pretend this is q_knn_join (pin = 1): two hinted sides must fail
    val v = lint("q_knn_join", df.queryExecution.optimizedPlan)
    assert(v.nonEmpty && v.head.contains("whitelist pins 1"), v.toString)
  }

  test("canary: an UNHINTED non-equi join of a data-scaled frame fails the forced sweep") {
    import org.apache.spark.sql.functions._
    withForcedThreshold {
      val ev = graft.core.Tables.events(spark, TestSpark.Sf0001)
      val perUser = ev.groupBy("user_id").agg(min("ts").as("t0"))
      // LEFT OUTER non-equi: no hash join possible and the outer side is
      // not reorderable, so BroadcastNestedLoopJoin must broadcast the
      // inner side even with auto-broadcast off (an INNER non-equi would
      // fall to CartesianProduct instead — no broadcast to flag)
      val df = ev.as("e").join(perUser.as("p"), col("e.ts") > col("p.t0"), "left_outer")
      val v = forcedBroadcastViolations("canary_forced", (_, _) => df)
      assert(v.nonEmpty, "the sweep must flag a structurally-forced broadcast of a per-user frame")
    }
  }
}
