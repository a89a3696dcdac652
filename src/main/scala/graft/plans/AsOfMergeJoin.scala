package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute,
  GenericInternalRow, InterpretedOrdering, JoinedRow, SortOrder,
  UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution,
  Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}

/** The WHOLE-OPERATOR extension tier (SURVEY.md §4's preference order
  * (c): custom `LogicalPlan` + `SparkStrategy` + `SparkPlan`, after
  * expressions (a/b) and the optimizer rule ([[SimilarityJoinRewrite]])):
  * an as-of join as a first-class PHYSICAL operator.
  *
  * [[graft.operators.AsOfJoin.asOf]] composes the same semantics from
  * built-ins (union + running `last(ignoreNulls)` window) — correct and
  * scalable, but it materializes L+R rows through one sort-window and
  * carries a null-padded payload column per left row through the
  * shuffle. This operator is the plan a time-series engine would emit
  * natively:
  *
  *   - `requiredChildDistribution` = ClusteredDistribution on each
  *     side's key → EnsureRequirements co-partitions the two children
  *     (ONE hash shuffle each, exactly like a sort-merge join);
  *   - `requiredChildOrdering` = (key, time) both sides → Spark inserts
  *     the partition-local sorts;
  *   - `doExecute` zips co-partitioned children and runs a linear
  *     TWO-POINTER MERGE per partition: each right row is visited once,
  *     each left row emits once with the held most-recent-past payload
  *     — O(|L|+|R|) per partition, no union frame, no window state, no
  *     row explosion on long histories.
  *
  * Semantics match [[graft.operators.AsOfJoin.asOf]] exactly (spec-
  * pinned equivalence): right row AT the left timestamp matches
  * (`rightTime <= leftTime`); several right rows sharing (key,
  * rightTime) resolve to the greatest payload tuple — the right sort
  * order ends with the payload columns, and the merge keeps the LAST
  * qualifying row, so the survivor is deterministic at any parallelism.
  * Left rows with no qualifying right row emit null payloads (left
  * join).
  */
case class AsOfMergeJoinPlan(
    left: LogicalPlan, right: LogicalPlan,
    leftKey: Attribute, rightKey: Attribute,
    leftTime: Attribute, rightTime: Attribute,
    payload: Seq[Attribute]) extends BinaryNode {
  override def output: Seq[Attribute] =
    left.output ++ payload.map(_.withNullability(true))
  override protected def withNewChildrenInternal(
      l: LogicalPlan, r: LogicalPlan): AsOfMergeJoinPlan =
    copy(left = l, right = r)
}

/** Plans [[AsOfMergeJoinPlan]] as [[AsOfMergeJoinExec]]; injected via
  * `SparkSessionExtensions.injectPlannerStrategy` in GraftExtensions.
  */
case class AsOfMergeStrategy() extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case j: AsOfMergeJoinPlan =>
      AsOfMergeJoinExec(j.leftKey, j.rightKey, j.leftTime, j.rightTime,
        j.payload, planLater(j.left), planLater(j.right)) :: Nil
    case _ => Nil
  }
}

case class AsOfMergeJoinExec(
    leftKey: Attribute, rightKey: Attribute,
    leftTime: Attribute, rightTime: Attribute,
    payload: Seq[Attribute],
    left: SparkPlan, right: SparkPlan) extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ payload.map(_.withNullability(true))

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(Seq(leftKey)) ::
      ClusteredDistribution(Seq(rightKey)) :: Nil

  // right ordering ends with the payload columns: among right rows tied
  // on (key, time) the merge keeps the LAST seen = greatest payload —
  // the composed operator's documented tie rule
  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTime, Ascending)),
    Seq(SortOrder(rightKey, Ascending), SortOrder(rightTime, Ascending)) ++
      payload.map(p => SortOrder(p, Ascending)))

  override def outputPartitioning: Partitioning = left.outputPartitioning
  override def outputOrdering: Seq[SortOrder] =
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTime, Ascending))

  override protected def withNewChildrenInternal(
      l: SparkPlan, r: SparkPlan): AsOfMergeJoinExec =
    copy(left = l, right = r)

  protected override def doExecute(): RDD[InternalRow] = {
    val leftOut = left.output
    val rightOut = right.output
    val out = output
    val (lk, rk, lt, rt) = (leftKey, rightKey, leftTime, rightTime)
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val lKeyProj = UnsafeProjection.create(Seq(lk), leftOut)
      val rKeyProj = UnsafeProjection.create(Seq(rk), rightOut)
      val lTimeProj = UnsafeProjection.create(Seq(lt), leftOut)
      val rTimeProj = UnsafeProjection.create(Seq(rt), rightOut)
      val keyOrd = InterpretedOrdering.forSchema(Seq(lk.dataType))
      val timeOrd = InterpretedOrdering.forSchema(Seq(lt.dataType))
      // bind payload refs against NULLABLE-forced right attrs: the
      // unmatched path feeds an all-null row, and a nullable=false
      // BoundReference would skip the null check and read garbage
      val resultProj = UnsafeProjection.create(out,
        leftOut ++ rightOut.map(_.withNullability(true)))
      val nullRight = new GenericInternalRow(rightOut.size)
      val joined = new JoinedRow

      new Iterator[InternalRow] {
        // rNext: the next unconsumed right row (valid until the next
        // rIter.next() — only issued after rNext is consumed or held).
        // held/heldKey are COPIES: they outlive iterator buffer reuse.
        private var rNext: InternalRow = _
        private var held: InternalRow = _
        private var heldKey: UnsafeRow = _

        override def hasNext: Boolean = lIter.hasNext

        override def next(): InternalRow = {
          val l = lIter.next()
          val lKeyRow = lKeyProj(l)
          val lTimeRow = lTimeProj(l)
          var ahead = false // right pointer moved past this left row
          while (!ahead && (rNext != null || rIter.hasNext)) {
            if (rNext == null) rNext = rIter.next()
            val c = keyOrd.compare(rKeyProj(rNext), lKeyRow)
            if (c < 0) rNext = null // right key already behind: discard
            else if (c == 0 && timeOrd.compare(rTimeProj(rNext), lTimeRow) <= 0) {
              held = rNext.copy() // most recent qualifying row so far
              heldKey = rKeyProj(rNext).copy()
              rNext = null
            } else ahead = true
          }
          val matched = heldKey != null && keyOrd.compare(heldKey, lKeyRow) == 0
          resultProj(joined(l, if (matched) held else nullRight))
        }
      }
    }
  }
}
