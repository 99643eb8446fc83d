package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{
  Ascending, Attribute, AttributeReference, BindReferences, Expression,
  GenericInternalRow, JoinedRow, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.types.LongType

/** Native as-of join — the whole-operator custom path of SURVEY.md §7.3(c):
  * a first-class `LogicalPlan` node, a planner `SparkStrategy`, and a
  * physical `BinaryExecNode` that declares distribution + ordering
  * requirements and streams a per-partition merge. Spark SQL has no ASOF
  * JOIN (DuckDB/Pandas do); the composable alternative is the union+window
  * trick (q_join_asof) — this operator is the engine-level form.
  *
  * Semantics: for each left row, the right row with the LARGEST time <=
  * left time within the same key (ties on right time broken by largest
  * value — matching q_join_asof's last-overwrites window), else null.
  *
  * Scale design: EnsureRequirements co-partitions both sides on the key
  * (one hash shuffle each — exactly a sort-merge join's cost envelope) and
  * sorts within partitions by (key, time); the merge is then a single
  * forward pass per partition, O(|L|+|R|), holding ONE saved (key, value)
  * pair — never a buffered group, so a user with millions of events costs
  * no memory. If the inputs are already bucketed/sorted on the key, the
  * shuffles and sorts plan away like any SMJ — that is the reason this is
  * an operator with REQUIREMENTS, not a hand-rolled zipPartitions job.
  *
  * Types are pinned to LongType (key/time/value) — the general form would
  * thread interpreted orderings; the narrow signature keeps the merge loop
  * primitive (no boxing) which is what you want on the hot path anyway.
  */
case class AsOfJoinPlan(
    left: LogicalPlan, right: LogicalPlan,
    leftKey: Expression, rightKey: Expression,
    leftTime: Expression, rightTime: Expression,
    rightVal: Expression,
    outAttr: AttributeReference) extends BinaryNode {
  require(Seq(leftKey, rightKey, leftTime, rightTime, rightVal)
    .forall(_.dataType == LongType), "as-of join supports LongType key/time/value")
  override def output: Seq[Attribute] = left.output :+ outAttr
  // outAttr is minted HERE, not read from a child — without this the
  // analyzer's missing-input check rejects the plan
  override def producedAttributes: org.apache.spark.sql.catalyst.expressions.AttributeSet =
    org.apache.spark.sql.catalyst.expressions.AttributeSet(outAttr)
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinPlan =
    copy(left = newLeft, right = newRight)
}

object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoinPlan(l, r, lk, rk, lt, rt, rv, out) =>
      AsOfJoinExec(planLater(l), planLater(r), lk, rk, lt, rt, rv, out) :: Nil
    case _ => Nil
  }
}

case class AsOfJoinExec(
    left: SparkPlan, right: SparkPlan,
    leftKey: Expression, rightKey: Expression,
    leftTime: Expression, rightTime: Expression,
    rightVal: Expression,
    outAttr: Attribute) extends BinaryExecNode {

  override def output: Seq[Attribute] = left.output :+ outAttr
  override def producedAttributes: org.apache.spark.sql.catalyst.expressions.AttributeSet =
    org.apache.spark.sql.catalyst.expressions.AttributeSet(outAttr)

  // co-partition both sides on the key: EnsureRequirements inserts the
  // hash exchanges (or reuses existing compatible partitioning/bucketing)
  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(Seq(leftKey)) :: ClusteredDistribution(Seq(rightKey)) :: Nil

  // within-partition sort by (key, time[, value]) makes the merge a single
  // forward pass; the right value participates so time ties resolve to the
  // largest value deterministically
  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTime, Ascending)),
    Seq(SortOrder(rightKey, Ascending), SortOrder(rightTime, Ascending),
      SortOrder(rightVal, Ascending)))

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)

  override protected def doExecute(): RDD[InternalRow] = {
    val lk = BindReferences.bindReference(leftKey, left.output)
    val lt = BindReferences.bindReference(leftTime, left.output)
    val rk = BindReferences.bindReference(rightKey, right.output)
    val rt = BindReferences.bindReference(rightTime, right.output)
    val rv = BindReferences.bindReference(rightVal, right.output)
    val outAttrs = output
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val proj = UnsafeProjection.create(outAttrs, outAttrs)
      val valRow = new GenericInternalRow(1)
      val joined = new JoinedRow
      // single-row lookahead on the right; one saved (key, value) pair —
      // O(1) state regardless of group sizes. Right rows with a SQL NULL
      // key/time are skipped (a NULL comparison is never true, so such
      // rows can never be an as-of match — unboxing them would alias NULL
      // to 0L and spuriously match key 0). Rows with a NULL VALUE are
      // skipped too, which makes this LAST-NON-NULL-VALUE as-of semantics
      // — the same spelling as q_join_asof's `last(value, ignoreNulls)`
      // window form, and deliberately NOT DuckDB/pandas ASOF (those would
      // match the latest qualifying row even when its payload is NULL and
      // yield NULL; here an earlier non-null value is carried forward
      // instead — pinned by AsOfJoinSpec's null-payload test).
      var rKeyCur = 0L; var rTimeCur = 0L; var rValCur = 0L
      var rValid = false
      def advanceRight(): Unit = {
        rValid = false
        while (!rValid && rIter.hasNext) {
          val r = rIter.next()
          val kO = rk.eval(r); val tO = rt.eval(r); val vO = rv.eval(r)
          if (kO != null && tO != null && vO != null) {
            rKeyCur = kO.asInstanceOf[Long]
            rTimeCur = tO.asInstanceOf[Long]
            rValCur = vO.asInstanceOf[Long]
            rValid = true
          }
        }
      }
      advanceRight()
      var savedKey = 0L; var savedVal = 0L; var savedDefined = false
      lIter.map { lrow =>
        val kO = lk.eval(lrow); val tO = lt.eval(lrow)
        if (kO == null || tO == null) {
          // a left row with NULL key/time matches nothing (DuckDB/Pandas
          // ASOF semantics); it still flows through with a NULL value
          valRow.update(0, null)
          proj(joined(lrow, valRow))
        } else {
          val k = kO.asInstanceOf[Long]
          val t = tO.asInstanceOf[Long]
          while (rValid && (rKeyCur < k || (rKeyCur == k && rTimeCur <= t))) {
            savedKey = rKeyCur; savedVal = rValCur; savedDefined = true
            advanceRight()
          }
          if (savedDefined && savedKey == k) valRow.update(0, savedVal)
          else valRow.update(0, null)
          proj(joined(lrow, valRow))
        }
      }
    }
  }
}

/** User-facing constructor (the `Dataset`-level API of the operator). */
object AsOfJoin {
  def apply(leftDf: DataFrame, lKey: String, lTime: String,
            rightDf: DataFrame, rKey: String, rTime: String, rVal: String,
            outName: String): DataFrame = {
    val lp = leftDf.queryExecution.analyzed
    val rp = rightDf.queryExecution.analyzed
    def attr(p: LogicalPlan, n: String) = p.output
      .find(_.name == n)
      .getOrElse(throw new IllegalArgumentException(s"column $n not found"))
    val rv = attr(rp, rVal)
    val out = AttributeReference(outName, rv.dataType, nullable = true)()
    org.apache.spark.sql.graftbridge.ofRows(leftDf.sparkSession,
      AsOfJoinPlan(lp, rp, attr(lp, lKey), attr(rp, rKey),
        attr(lp, lTime), attr(rp, rTime), rv, out))
  }
}
