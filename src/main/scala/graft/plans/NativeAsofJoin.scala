package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, GraftSqlShim, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{
  Ascending, Attribute, BindReferences, Expression, GenericInternalRow,
  JoinedRow, RowOrdering, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}

/** Native as-of join — the full custom-operator ladder, option (c):
  * a `LogicalPlan` node, a `SparkStrategy`, and a `SparkPlan` that
  * executes the join as a single co-partitioned merge pass.
  *
  * Semantics: for every left row, attach the LAST right row with equal
  * keys and `rightTs` strictly less than `leftTs` (nulls when none) —
  * purchase→most-recent-view attribution, trade→quote matching, etc.
  *
  * Scale shape (this is what the window-composition form can't state
  * explicitly): `requiredChildDistribution` clusters both children on
  * the join keys, so EnsureRequirements co-partitions them with ONE
  * shuffle per side; `requiredChildOrdering` asks for (keys, ts) sort
  * within partitions, and the merge then streams both sides with O(1)
  * state per partition — one retained right row, no buffering of the
  * right side, no per-key group materialization. Equivalent plans via
  * union+window (AsofJoin.scala) carry both inputs through one wider
  * shuffle; the native operator keeps each side's shuffle narrow and
  * is the form a range/as-of join would take in a production engine.
  */
case class AsofJoinNode(
    left: LogicalPlan,
    right: LogicalPlan,
    leftKeys: Seq[Expression],
    rightKeys: Seq[Expression],
    leftTs: Expression,
    rightTs: Expression,
    toleranceNs: Option[Long] = None) extends BinaryNode {
  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsofJoinNode =
    copy(left = newLeft, right = newRight)
}

/** Planner strategy: `AsofJoinNode` → `AsofJoinExec`. Injected via
  * `SparkSessionExtensions.injectPlannerStrategy` (GraftExtensions) or
  * `spark.experimental.extraStrategies` (ensureRegistered). */
object AsofJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsofJoinNode(l, r, lk, rk, lts, rts, tol) =>
      AsofJoinExec(lk, rk, lts, rts, planLater(l), planLater(r), tol) :: Nil
    case _ => Nil
  }
}

case class AsofJoinExec(
    leftKeys: Seq[Expression],
    rightKeys: Seq[Expression],
    leftTs: Expression,
    rightTs: Expression,
    left: SparkPlan,
    right: SparkPlan,
    toleranceNs: Option[Long] = None) extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  // One hash shuffle per side, co-partitioned on the join keys — the
  // same contract SortMergeJoinExec declares.
  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(leftKeys) :: ClusteredDistribution(rightKeys) :: Nil

  // In-partition sort by (keys, ts): the merge below is then a single
  // forward pass over both iterators.
  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    leftKeys.map(SortOrder(_, Ascending)) :+ SortOrder(leftTs, Ascending),
    rightKeys.map(SortOrder(_, Ascending)) :+ SortOrder(rightTs, Ascending))

  override def outputPartitioning: Partitioning = left.outputPartitioning
  override def outputOrdering: Seq[SortOrder] = requiredChildOrdering.head

  override protected def doExecute(): RDD[InternalRow] = {
    val keyTypes = leftKeys.map(_.dataType)
    left.execute().zipPartitions(right.execute()) { (li, ri) =>
      val lKeyProj = UnsafeProjection.create(leftKeys, left.output)
      val rKeyProj = UnsafeProjection.create(rightKeys, right.output)
      val lTsBound = BindReferences.bindReference(leftTs, left.output)
      val rTsBound = BindReferences.bindReference(rightTs, right.output)
      val keyOrd = RowOrdering.createNaturalAscendingOrdering(keyTypes)
      val joined = new JoinedRow
      val nullRight = new GenericInternalRow(right.output.size)
      val resultProj = UnsafeProjection.create(output, output)

      var rRow: InternalRow = null
      var rKey: InternalRow = null
      var rTs: Long = 0L
      // SQL join semantics: a null key or null ts never matches anything,
      // so such right rows are skipped outright (they'd otherwise compare
      // equal under RowOrdering's null==null, or NPE on the ts cast).
      def advanceRight(): Unit = {
        rRow = null; rKey = null
        while (rRow == null && ri.hasNext) {
          val cand = ri.next()
          val k = rKeyProj(cand)
          val t = rTsBound.eval(cand)
          if (!k.anyNull && t != null) {
            rRow = cand; rKey = k.copy(); rTs = t.asInstanceOf[Long]
          }
        }
      }
      advanceRight()

      // O(1) per-partition state: the latest right row whose key still
      // matches and whose ts stays strictly below the current left ts.
      var lastKey: InternalRow = null
      var lastMatch: InternalRow = null
      var lastMatchTs: Long = Long.MinValue
      val tol = toleranceNs.getOrElse(Long.MaxValue)

      li.map { lRow =>
        val lKey = lKeyProj(lRow)
        val lTsVal = lTsBound.eval(lRow)
        if (lKey.anyNull || lTsVal == null) {
          // Null key/ts on the left matches nothing; nulls sort first in
          // the required Ascending order so skipping them here never
          // desynchronizes the merge for later rows of the partition.
          resultProj(joined(lRow, nullRight))
        } else {
          val lTs = lTsVal.asInstanceOf[Long]
          var cmp = if (rRow == null) 1 else keyOrd.compare(rKey, lKey)
          while (rRow != null && (cmp < 0 || (cmp == 0 && rTs < lTs))) {
            if (cmp == 0) { lastMatch = rRow.copy(); lastKey = rKey; lastMatchTs = rTs }
            advanceRight()
            cmp = if (rRow == null) 1 else keyOrd.compare(rKey, lKey)
          }
          // Tolerance: the retained match must also lie within
          // `toleranceNs` of the left ts (lTs - matchTs is positive by
          // the strict < merge condition). Long.MaxValue = unbounded.
          val m =
            if (lastMatch != null && keyOrd.compare(lastKey, lKey) == 0 &&
              lTs - lastMatchTs <= tol) lastMatch
            else nullRight
          resultProj(joined(lRow, m))
        }
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsofJoinExec =
    copy(left = newLeft, right = newRight)
}

/** User-facing API for the native operator. */
object NativeAsofJoin {

  /** Idempotently add the strategy to the session planner (covers
    * sessions not launched with spark.sql.extensions=graft.GraftExtensions). */
  def ensureRegistered(spark: SparkSession): Unit =
    if (!spark.experimental.extraStrategies.contains(AsofJoinStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ AsofJoinStrategy

  /** As-of join `left` to the last strictly-earlier `right` row with
    * equal keys, optionally only when it lies within `toleranceNs` of
    * the left timestamp (older matches null-pad — trade-to-quote with a
    * staleness bound). Column names must be disjoint across the two
    * sides (pre-alias, as with any join); ts columns are LongType
    * epoch-nanos.
    */
  def asofJoin(
      left: DataFrame, right: DataFrame,
      leftOn: Seq[String], rightOn: Seq[String],
      leftTsCol: String, rightTsCol: String,
      toleranceNs: Option[Long] = None): DataFrame = {
    val spark = left.sparkSession
    ensureRegistered(spark)
    val lp = left.queryExecution.analyzed
    val rp = right.queryExecution.analyzed
    def attr(p: LogicalPlan, n: String): Attribute =
      p.output.find(_.name == n).getOrElse(
        throw new IllegalArgumentException(
          s"asofJoin: no column '$n' in ${p.output.map(_.name).mkString(",")}"))
    GraftSqlShim.ofRows(spark,
      AsofJoinNode(lp, rp,
        leftOn.map(attr(lp, _)), rightOn.map(attr(rp, _)),
        attr(lp, leftTsCol), attr(rp, rightTsCol), toleranceNs))
  }
}
