package graft

import org.apache.spark.sql.catalyst.plans.logical._
import org.scalatest.funsuite.AnyFunSuite

/** Machine check for the r11 q_substring_dup defect class: an EXPLICIT
  * `broadcast()` hint on a frame that scales with the data is a plan that
  * works at fixture stats and OOMs at 100 TB — and unlike a planner-chosen
  * broadcast (which flips to a shuffle join when real statistics arrive),
  * a hint OVERRIDES statistics, so it can never save itself at scale.
  * Planner-chosen broadcasts are deliberately out of scope: at sf0.001
  * everything is under the threshold and the choice is stats-adaptive.
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
  */
class BroadcastDomainLintSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val DataScaledKey =
    """(?i)^(doc_id|user_id|vec_id|event_id|o_orderkey|l_orderkey|o_custkey|c_custkey|p_partkey|s_suppkey|l_partkey|l_suppkey|gram|shingle)$""".r

  private val FactTables = Seq("lineitem", "orders", "events", "documents", "embeddings")

  /** (query -> one-line domain bound) waivers for flagged-but-bounded
    * build sides. Adding a key is a reviewed claim, as in
    * GlobalWindowLintSpec.
    */
  private val Whitelist: Map[String, String] = Map(
    "q_knn_join" -> "hinted side is the <=5-row vec_id<5 probe set (filter below the hint)",
    "q_mrl_trunc" -> "same <=5-row probe-set shape as q_knn_join",
    "q_topk_similar" -> "same <=5-row probe-set shape as q_knn_join"
  )

  private def groupNames(a: Aggregate): Seq[String] =
    a.groupingExpressions.flatMap(_.references.map(_.name))

  /** First bounding node wins on each path below the hinted side. */
  private def check(p: LogicalPlan): Seq[String] = p match {
    case _: GlobalLimit | _: LocalLimit => Nil
    case a: Aggregate =>
      val bad = groupNames(a).filter(n => DataScaledKey.findFirstIn(n).isDefined)
      if (bad.nonEmpty) Seq(s"hinted broadcast of an aggregate grouped by data-scaled ${bad.distinct.mkString(",")}")
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
        .map(t => s"hinted broadcast of a raw $t scan").toSeq
    case other => other.children.flatMap(check)
  }

  private def lint(name: String, plan: LogicalPlan): Seq[String] = {
    if (Whitelist.contains(name)) Nil
    else plan.collect { case j: Join =>
      Seq(j.hint.leftHint -> j.left, j.hint.rightHint -> j.right).collect {
        case (Some(h), side) if h.strategy.contains(BROADCAST) => side
      }
    }.flatten.flatMap(side => check(side).map(v => s"$name: $v"))
  }

  test("no registered query HINT-broadcasts a data-scaled frame") {
    val violations = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, q) =>
        lint(name, q(spark, TestSpark.Sf0001).queryExecution.optimizedPlan)
    }
    assert(violations.isEmpty,
      s"${violations.length} broadcast-domain violations:\n${violations.mkString("\n")}")
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
}
