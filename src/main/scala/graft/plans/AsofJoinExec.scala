package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, BindReferences, Expression, GenericInternalRow, JoinedRow, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.catalyst.util.TypeUtils
import org.apache.spark.sql.execution.metric.SQLMetrics
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan}

/** Physical AS-OF JOIN: a co-partitioned, co-sorted streaming merge.
  *
  * Required shape (Catalyst's EnsureRequirements materializes it):
  * both children clustered on their key and sorted (key ASC, time ASC)
  * within partitions — the same two exchanges + two sorts a sort-merge
  * join pays, after which the merge itself is one forward pass with
  * O(1) state: per left row, the right cursor only ever advances, and
  * the operator holds exactly ONE buffered right row (the current key's
  * best `time ≤/< leftTime` candidate). No per-key group buffering, no
  * range partitioning, no broadcast — at 100 TB both sides shuffle once
  * on the key and stream; a skewed key costs its own partition run and
  * nothing else. Contrast with the composable q50 window form, which
  * funnels BOTH sides through one union exchange and carries a
  * null-padded struct through the sort; here each side keeps its own
  * (narrower) shuffle and the right side is typically the small one.
  *
  * Row-level contract: left rows with a null key or null time emit
  * null-extended immediately (no right row can match them — the same
  * answer a null-unsafe join condition yields); right rows with a null
  * key or time are consumed and dropped. Output preserves the left
  * partition's (key, time) order, which [[outputOrdering]] advertises so
  * a downstream consumer needing that order pays no new Sort.
  *
  * Not whole-stage-codegen'd: a specialized two-iterator merge is the
  * one operator shape codegen cannot fuse anyway (SortMergeJoinExec
  * itself only supports codegen for inner-like types); the per-row work
  * is two bound-attribute reads and a primitive comparison.
  */
case class AsofJoinExec(
    leftKey: Expression,
    rightKey: Expression,
    leftTime: Expression,
    rightTime: Expression,
    strict: Boolean,
    left: SparkPlan,
    right: SparkPlan) extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override lazy val metrics = Map(
    "numOutputRows" -> SQLMetrics.createMetric(sparkContext, "number of output rows"),
    "numMatched" -> SQLMetrics.createMetric(sparkContext, "number of matched rows"))

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(Seq(leftKey)) :: ClusteredDistribution(Seq(rightKey)) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] =
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTime, Ascending)) ::
      Seq(SortOrder(rightKey, Ascending), SortOrder(rightTime, Ascending)) :: Nil

  /** Rows stream through in left order, so the left child's partitioning
    * and (key, time) ordering survive — advertising both lets Catalyst
    * skip re-exchanges/re-sorts downstream (the same contract
    * SortMergeJoinExec honors). */
  override def outputPartitioning: Partitioning = left.outputPartitioning
  override def outputOrdering: Seq[SortOrder] =
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTime, Ascending))

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsofJoinExec =
    copy(left = newLeft, right = newRight)

  protected override def doExecute(): RDD[InternalRow] = {
    val numOutputRows = longMetric("numOutputRows")
    val numMatched = longMetric("numMatched")
    val lOut = left.output
    val rOut = right.output
    val allOut = output
    // bind once on the driver; bound expressions are serializable
    val lkB = BindReferences.bindReference(leftKey, lOut)
    val ltB = BindReferences.bindReference(leftTime, lOut)
    val rkB = BindReferences.bindReference(rightKey, rOut)
    val rtB = BindReferences.bindReference(rightTime, rOut)
    val keyOrd = TypeUtils.getInterpretedOrdering(leftKey.dataType)
    val timeOrd = TypeUtils.getInterpretedOrdering(leftTime.dataType)
    val isStrict = strict

    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      // input schema must carry the OUTPUT's nullability on the right
      // side: binding against the child's non-nullable attributes would
      // let the projection skip null checks and read 0s out of the
      // null-extension row
      val proj = UnsafeProjection.create(
        allOut, lOut ++ rOut.map(_.withNullability(true)))
      val joined = new JoinedRow
      val nullRight = new GenericInternalRow(rOut.length)

      new Iterator[InternalRow] {
        // one-row lookahead on the right; rows are COPIED on read because
        // the upstream sorter reuses its UnsafeRow buffer
        private var rHead: InternalRow = advanceRight()
        // the current best candidate: the last right row whose key we
        // consumed while it was ≤ the left cursor's key — valid for a
        // given left row only when heldKey compares equal to its key
        private var held: InternalRow = null
        private var heldKey: Any = null

        private def advanceRight(): InternalRow =
          if (rIter.hasNext) rIter.next().copy() else null

        override def hasNext: Boolean = lIter.hasNext

        override def next(): InternalRow = {
          val l = lIter.next()
          val lk = lkB.eval(l)
          val lt = ltB.eval(l)
          numOutputRows += 1
          if (lk == null || lt == null) return proj(joined(l, nullRight))
          // advance the right cursor while it is still "useful" for this
          // (and therefore any later) left row: behind on key, or same
          // key with an admissible time. Null-key/time right rows sort
          // first under ASC-nulls-first and are consumed and dropped.
          var advancing = true
          while (advancing && rHead != null) {
            val rk = rkB.eval(rHead)
            val rt = rtB.eval(rHead)
            if (rk == null || rt == null) {
              rHead = advanceRight()
            } else {
              val c = keyOrd.compare(rk, lk)
              val timeOk =
                if (isStrict) timeOrd.compare(rt, lt) < 0
                else timeOrd.compare(rt, lt) <= 0
              if (c < 0) {
                rHead = advanceRight() // stale key: skip, never a candidate again
              } else if (c == 0 && timeOk) {
                held = rHead; heldKey = rk // newest admissible row wins
                rHead = advanceRight()
              } else {
                advancing = false // ahead of this left row; stop
              }
            }
          }
          if (held != null && keyOrd.compare(heldKey, lk) == 0) {
            numMatched += 1
            proj(joined(l, held))
          } else proj(joined(l, nullRight))
        }
      }
    }
  }
}
