package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, GraftSqlInternals}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{
  Alias, And, Ascending, Attribute, Expression, GenericInternalRow, JoinedRow,
  PredicateHelper, RowOrdering, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, Filter, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.plans.physical.{
  BroadcastDistribution, ClusteredDistribution, Distribution, IdentityBroadcastMode,
  UnspecifiedDistribution}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Native as-of join: the full custom-operator stack (logical node →
  * optimizer rule → planner strategy → physical operator), registered
  * through `SparkSessionExtensions` in [[graft.functions.GraftExtensions]].
  *
  * Semantics: LEFT as-of — every left row is emitted once, joined to the
  * single right row with equal keys and the greatest `rightTime <=
  * leftTime` (ties broken by the greatest `rightTieBreak`), or right-nulls
  * when no such row exists (or the match is older than `toleranceMicros`).
  *
  * Why a custom operator instead of the window-composition form
  * ([[graft.ops.TimeOps.asofJoinClickToView]], which remains the
  * same-schema special case): the general two-table as-of cannot be
  * expressed as one window without first unioning both sides into a common
  * schema — at 100 TB that means materializing a padded union of a wide
  * probe table and a wide reference table, carrying every column of both
  * through one sort. The physical operator here instead asks Catalyst for
  * exactly what a sort-merge join gets — both children hash-clustered on
  * the keys and sorted by (keys, time) — and then streams the two sorted
  * partitions through a single forward-only merge: O(1) state (one buffered
  * right row), zero memory amplification, no union, no window. Each side is
  * shuffled at most once, and EnsureRequirements elides even that when the
  * child is already clustered (e.g. a bucketed table).
  */
case class AsOfJoinNode(
    left: LogicalPlan,
    right: LogicalPlan,
    leftKeys: Seq[Expression],
    rightKeys: Seq[Expression],
    leftTime: Expression,
    rightTime: Expression,
    rightTieBreak: Option[Expression],
    toleranceMicros: Option[Long],
    // Some(true) forces the broadcast plan, Some(false) forces sorted-merge
    // (what a query pins when the small-SF size estimate would flip a plan
    // meant to represent the at-scale shape), None lets the strategy decide
    // from the right side's size estimate.
    broadcastRight: Option[Boolean] = None) extends BinaryNode {

  require(leftKeys.length == rightKeys.length && leftKeys.nonEmpty,
    "as-of join needs matching, non-empty key lists")

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinNode =
    copy(left = newLeft, right = newRight)
}

/** Planner strategy: the same duality Spark's own equi-join planner has.
  * A small reference side (explicitly hinted, or estimated under
  * `spark.sql.autoBroadcastJoinThreshold`) plans as
  * [[BroadcastAsOfJoinExec]] — the big probe side is NEVER shuffled, its
  * partitioning and ordering survive the join. Otherwise the sorted-merge
  * [[AsOfJoinExec]] shuffles both sides on the keys, and
  * EnsureRequirements places the exchanges/sorts.
  */
class AsOfJoinStrategy(session: org.apache.spark.sql.SparkSession) extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case n: AsOfJoinNode =>
      val threshold = session.sessionState.conf.autoBroadcastJoinThreshold
      val small = threshold >= 0 && n.right.stats.sizeInBytes <= threshold
      // the broadcast variant reads the tiebreak positionally as a long;
      // other tiebreak types fall back to the sorted-merge plan
      val tieOk = n.rightTieBreak.forall(t =>
        t.dataType == LongType || t.dataType == TimestampType ||
          t.dataType == TimestampNTZType)
      if (n.broadcastRight.getOrElse(small) && tieOk)
        BroadcastAsOfJoinExec(
          n.leftKeys, n.rightKeys, n.leftTime, n.rightTime,
          n.rightTieBreak, n.toleranceMicros,
          planLater(n.left), planLater(n.right)) :: Nil
      else
        AsOfJoinExec(
          n.leftKeys, n.rightKeys, n.leftTime, n.rightTime,
          n.rightTieBreak, n.toleranceMicros,
          planLater(n.left), planLater(n.right)) :: Nil
    case _ => Nil
  }
}

/** Optimizer rule: Catalyst's own PushDownPredicates does not know this
  * node, so without help a `Filter` above the as-of join sits on top of the
  * shuffle and the scan reads the full table. Left-side deterministic
  * conjuncts commute with a LEFT as-of join (each left row is processed
  * independently), so they are pushed into the left child, where the
  * existing rules carry them all the way into the parquet scan
  * (`PushedFilters`). Right-side predicates do NOT commute (filtering the
  * reference side changes which row is "most recent") and are left alone.
  */
object PushFilterThroughAsOfJoin extends Rule[LogicalPlan] with PredicateHelper {
  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f @ Filter(cond, j: AsOfJoinNode) =>
      val (push, keep) = splitConjunctivePredicates(cond)
        .partition(p => p.deterministic && p.references.subsetOf(j.left.outputSet))
      if (push.isEmpty) f
      else {
        val pushed = j.copy(left = Filter(push.reduce(And), j.left))
        keep.reduceOption(And).map(Filter(_, pushed)).getOrElse(pushed)
      }
  }
}

/** Physical sorted-merge as-of join.
  *
  * Requires both children clustered on the join keys and sorted by
  * (keys, time[, tiebreak]); emits, per partition, one pass over each side.
  * The right cursor only ever moves forward: for the current left row it
  * advances while the right key is behind or (same key) the right time is
  * at-or-before the left time, remembering the last row consumed with an
  * equal key — which, by the sort order, is exactly the max-(time,
  * tiebreak) match. Later left rows (same key, later time) reuse or improve
  * that match. Per-task state is ONE buffered right row regardless of
  * partition size, so the operator survives arbitrarily large key groups
  * without spilling.
  */
case class AsOfJoinExec(
    leftKeys: Seq[Expression],
    rightKeys: Seq[Expression],
    leftTime: Expression,
    rightTime: Expression,
    rightTieBreak: Option[Expression],
    toleranceMicros: Option[Long],
    left: SparkPlan,
    right: SparkPlan) extends BinaryExecNode {

  // All three are Long-backed (micros / micros / raw), so getLong works.
  private def timeOk(e: Expression): Boolean =
    e.dataType == TimestampType || e.dataType == TimestampNTZType ||
      e.dataType == LongType
  require(timeOk(leftTime) && timeOk(rightTime),
    s"as-of time columns must be timestamp or long, got " +
      s"${leftTime.dataType} / ${rightTime.dataType}")

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(leftKeys) :: ClusteredDistribution(rightKeys) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    (leftKeys :+ leftTime).map(SortOrder(_, Ascending)),
    (rightKeys ++ (rightTime +: rightTieBreak.toSeq)).map(SortOrder(_, Ascending)))

  // The merge preserves the left child's per-partition order, so downstream
  // operators (e.g. a windowed consumer keyed the same way) can skip a sort.
  override def outputOrdering: Seq[SortOrder] =
    (leftKeys :+ leftTime).map(SortOrder(_, Ascending))

  override def outputPartitioning = left.outputPartitioning

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)

  override protected def doExecute(): RDD[InternalRow] = {
    val nKeys = leftKeys.length
    val keyTypes = leftKeys.map(_.dataType)
    val lOut = left.output
    val rOut = right.output
    val lExprs = leftKeys :+ leftTime
    val rExprs = rightKeys :+ rightTime
    val tol = toleranceMicros
    val allOut = output

    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      // Projections reuse an internal buffer; values are read (or copied)
      // before the next projection call, and the two sides use separate
      // projection instances so their buffers never clash.
      val lProj = UnsafeProjection.create(lExprs, lOut)
      val rProj = UnsafeProjection.create(rExprs, rOut)
      // Compares only the first nKeys fields, so the trailing time field in
      // the projected rows is ignored here and read positionally instead.
      val keyOrd = RowOrdering.createNaturalAscendingOrdering(keyTypes)
      val nullRight = new GenericInternalRow(rOut.length)
      val joined = new JoinedRow
      val resultProj = UnsafeProjection.create(allOut, allOut)
      val rBuf = rIter.buffered

      var matchRow: InternalRow = null
      var matchKey: UnsafeRow = null
      var matchTime = 0L

      // SQL equi-join semantics: a null key never matches, not even
      // another null — and a null TIME can't satisfy rt <= lt either
      // (getLong on a null slot would read 0 and fabricate a match).
      // Null-key/time right rows are discarded as the cursor passes them;
      // null left rows emit right-nulls without touching the cursor.
      def keyHasNull(row: InternalRow): Boolean = {
        var i = 0
        var found = false
        while (i <= nKeys && !found) { found = row.isNullAt(i); i += 1 }
        found
      }

      lIter.map { lRow =>
        val lkt = lProj(lRow)
        if (keyHasNull(lkt)) {
          resultProj(joined(lRow, nullRight))
        } else {
          val lTimeV = lkt.getLong(nKeys)
          var scanning = true
          while (scanning && rBuf.hasNext) {
            val rkt = rProj(rBuf.head)
            if (keyHasNull(rkt)) {
              rBuf.next() // unmatched by definition
            } else {
              val c = keyOrd.compare(rkt, lkt)
              if (c < 0) {
                rBuf.next() // right key behind every remaining left row's key
              } else if (c == 0 && rkt.getLong(nKeys) <= lTimeV) {
                matchTime = rkt.getLong(nKeys)
                matchKey = rkt.copy()
                matchRow = rBuf.next().copy()
              } else {
                scanning = false // right ahead; later left rows may need it
              }
            }
          }
          val hit = matchRow != null && keyOrd.compare(matchKey, lkt) == 0 &&
            tol.forall(t => lTimeV - matchTime <= t)
          resultProj(joined(lRow, if (hit) matchRow else nullRight))
        }
      }
    }
  }
}

/** Broadcast as-of join: the small-reference physical variant.
  *
  * The right side arrives whole in every task (BroadcastDistribution with
  * identity mode); each task groups it by key and sorts each group by
  * (time, tiebreak) ONCE, then probes with a binary search per left row.
  * The probe side needs NO distribution and NO ordering — at 100 TB the
  * fact table is never shuffled or sorted for this join, and its existing
  * partitioning/ordering survive for downstream operators (the same
  * reason Spark prefers broadcast-hash over sort-merge when it can).
  */
case class BroadcastAsOfJoinExec(
    leftKeys: Seq[Expression],
    rightKeys: Seq[Expression],
    leftTime: Expression,
    rightTime: Expression,
    rightTieBreak: Option[Expression],
    toleranceMicros: Option[Long],
    left: SparkPlan,
    right: SparkPlan) extends BinaryExecNode {

  // this variant reads time/tiebreak positionally as longs
  rightTieBreak.foreach { t =>
    require(t.dataType == LongType || t.dataType == TimestampType ||
      t.dataType == TimestampNTZType,
      s"broadcast as-of tiebreak must be long/timestamp, got ${t.dataType}")
  }

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override def requiredChildDistribution: Seq[Distribution] =
    UnspecifiedDistribution ::
      BroadcastDistribution(IdentityBroadcastMode) :: Nil

  // the probe side flows through untouched — advertise that
  override def outputPartitioning = left.outputPartitioning
  override def outputOrdering: Seq[SortOrder] = left.outputOrdering

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): BroadcastAsOfJoinExec =
    copy(left = newLeft, right = newRight)

  override protected def doExecute(): RDD[InternalRow] = {
    val nKeys = leftKeys.length
    val lOut = left.output
    val rOut = right.output
    val lExprs = leftKeys :+ leftTime
    // tiebreak participates only through the sort order of each group
    val rExprs = rightKeys ++ (rightTime +: rightTieBreak.toSeq)
    val tol = toleranceMicros
    val allOut = output
    val broadcastRows = right.executeBroadcast[Array[InternalRow]]()

    left.execute().mapPartitions { lIter =>
      val lProj = UnsafeProjection.create(lExprs, lOut)
      val rProj = UnsafeProjection.create(rExprs, rOut)
      val keyOnly = UnsafeProjection.create(
        rightKeys.zipWithIndex.map { case (e, i) =>
          org.apache.spark.sql.catalyst.expressions.BoundReference(i, e.dataType, e.nullable)
        },
        Nil)
      // group the broadcast side by key, each group sorted by the
      // projection's (time[, tiebreak]) — done once per task, over the
      // SMALL side only
      val index = new java.util.HashMap[UnsafeRow, Array[(Long, InternalRow)]]()
      locally {
        val tmp = new java.util.HashMap[UnsafeRow, scala.collection.mutable.ArrayBuffer[(Long, Long, InternalRow)]]()
        broadcastRows.value.foreach { r =>
          val kt = rProj(r)
          // SQL equi-join semantics: null keys never match, and a null
          // time can't satisfy rt <= lt — leave both out of the index
          if (!(0 to nKeys).exists(kt.isNullAt)) {
            val key = keyOnly(kt).copy()
            val time = kt.getLong(nKeys)
            val tie = if (rightTieBreak.isDefined) kt.getLong(nKeys + 1) else 0L
            val buf = tmp.computeIfAbsent(key, _ => scala.collection.mutable.ArrayBuffer.empty)
            buf += ((time, tie, r.copy()))
          }
        }
        tmp.forEach { (k, buf) =>
          index.put(k, buf.sortBy(t => (t._1, t._2)).map(t => (t._1, t._3)).toArray)
        }
      }
      val lKeyOnly = UnsafeProjection.create(
        leftKeys.zipWithIndex.map { case (e, i) =>
          org.apache.spark.sql.catalyst.expressions.BoundReference(i, e.dataType, e.nullable)
        },
        Nil)
      val nullRight = new GenericInternalRow(rOut.length)
      val joined = new JoinedRow
      val resultProj = UnsafeProjection.create(allOut, allOut)

      lIter.map { lRow =>
        val lkt = lProj(lRow)
        val lTimeV = lkt.getLong(nKeys)
        val group =
          if ((0 to nKeys).exists(lkt.isNullAt)) null // null key/time: no match
          else index.get(lKeyOnly(lkt))
        var hit: InternalRow = null
        if (group != null) {
          // greatest entry with time <= lTimeV: binary search upper bound
          var lo = 0
          var hi = group.length // exclusive
          while (lo < hi) {
            val mid = (lo + hi) >>> 1
            if (group(mid)._1 <= lTimeV) lo = mid + 1 else hi = mid
          }
          if (lo > 0) {
            val (t, row) = group(lo - 1)
            if (tol.forall(x => lTimeV - t <= x)) hit = row
          }
        }
        resultProj(joined(lRow, if (hit != null) hit else nullRight))
      }
    }
  }
}

/** DataFrame-level entry point. */
object AsOfJoin {

  /** LEFT as-of join `left` to `right` on equal `on` columns, matching the
    * most recent right row with `right.rightTimeCol <= left.leftTimeCol`
    * (within `toleranceMicros`, when given; ties on time broken by the
    * greatest `rightTieBreak`). Output is every left column followed by
    * every right NON-KEY column (nullable) — USING-join style, so the key
    * appears once and unqualified downstream references stay unambiguous.
    *
    * Children enter as their *analyzed* plans; if the two frames share
    * lineage (a self-as-of), the right side's attributes are re-aliased to
    * fresh ids — the disambiguation the analyzer would normally do for a
    * self-join, done here because the node is built already-resolved.
    */
  def leftAsOf(
      left: DataFrame,
      right: DataFrame,
      on: Seq[String],
      leftTimeCol: String,
      rightTimeCol: String,
      rightTieBreak: Option[String] = None,
      toleranceMicros: Option[Long] = None,
      broadcastRight: Option[Boolean] = None): DataFrame = {
    val spark = left.sparkSession
    val lPlan = left.queryExecution.analyzed
    val rPlan0 = right.queryExecution.analyzed
    val rPlan =
      if (lPlan.outputSet.intersect(rPlan0.outputSet).isEmpty) rPlan0
      else Project(rPlan0.output.map(a => Alias(a, a.name)()), rPlan0)

    def res(plan: LogicalPlan, name: String): Attribute =
      plan.output.find(_.name == name).getOrElse(
        throw new IllegalArgumentException(
          s"as-of column '$name' not found in [${plan.output.map(_.name).mkString(", ")}]"))

    val rightKeyAttrs = on.map(res(rPlan, _))
    val node = AsOfJoinNode(
      lPlan, rPlan,
      on.map(res(lPlan, _)), rightKeyAttrs,
      res(lPlan, leftTimeCol), res(rPlan, rightTimeCol),
      rightTieBreak.map(res(rPlan, _)), toleranceMicros, broadcastRight)
    val keyIds = rightKeyAttrs.map(_.exprId).toSet
    val visible = node.output.filterNot(a => keyIds.contains(a.exprId))
    GraftSqlInternals.ofRows(spark, Project(visible, node))
  }
}
