package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.{Cross, Inner, LeftOuter, LeftSemi, RightOuter}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, Join, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.v2.StreamingDataSourceV2ScanRelation
import org.apache.spark.sql.types.DateType
import org.apache.spark.sql.{sources => v1}

/** Streaming ZONE-MAP pruning: Spark's optimizer pushes filters to BATCH
  * scan builders only — a micro-batch scan builder's
  * `SupportsPushDownFilters` is never invoked, so a filtered stream over
  * a clustered table decodes every fresh file of every commit. This rule
  * closes that gap the way the engine's other whole-plan extensions do
  * (registered via [[graft.functions.GraftExtensions]]): when a Filter
  * sits directly above a graft streaming relation in a micro-batch's
  * optimized plan, its prunable conjuncts are handed to the stream as a
  * SIDE CHANNEL — the Filter node itself stays in the plan, Spark still
  * applies it to every surviving row, and `planInputPartitions` uses the
  * bounds only to SKIP files whose commit-time zone maps positively
  * exclude them. Results can never depend on the hand-off; at 100 TB
  * ingest rates a selective consumer reads the fresh files that can
  * match instead of all of them.
  */
object PushFiltersIntoVersionedStream extends Rule[LogicalPlan] with PredicateHelper {

  private def ext(l: Literal): Any = l.dataType match {
    // internal date literals are epoch-day ints; the v1 Filter surface
    // (and the stream's bound derivation) speaks java.time.LocalDate
    case DateType => l.value match {
      case i: java.lang.Integer => java.time.LocalDate.ofEpochDay(i.longValue)
      case other                => other
    }
    case _ => l.value // Long/Int boxed as-is; UTF8String accepted downstream
  }

  private def toV1(e: Expression): Option[v1.Filter] = e match {
    case EqualTo(a: Attribute, l: Literal) => Some(v1.EqualTo(a.name, ext(l)))
    case EqualTo(l: Literal, a: Attribute) => Some(v1.EqualTo(a.name, ext(l)))
    case GreaterThan(a: Attribute, l: Literal) =>
      Some(v1.GreaterThan(a.name, ext(l)))
    case GreaterThan(l: Literal, a: Attribute) =>
      Some(v1.LessThan(a.name, ext(l)))
    case GreaterThanOrEqual(a: Attribute, l: Literal) =>
      Some(v1.GreaterThanOrEqual(a.name, ext(l)))
    case GreaterThanOrEqual(l: Literal, a: Attribute) =>
      Some(v1.LessThanOrEqual(a.name, ext(l)))
    case LessThan(a: Attribute, l: Literal) =>
      Some(v1.LessThan(a.name, ext(l)))
    case LessThan(l: Literal, a: Attribute) =>
      Some(v1.GreaterThan(a.name, ext(l)))
    case LessThanOrEqual(a: Attribute, l: Literal) =>
      Some(v1.LessThanOrEqual(a.name, ext(l)))
    case LessThanOrEqual(l: Literal, a: Attribute) =>
      Some(v1.GreaterThanOrEqual(a.name, ext(l)))
    case In(a: Attribute, vs) if vs.nonEmpty && vs.forall(_.isInstanceOf[Literal]) =>
      Some(v1.In(a.name, vs.map(x => ext(x.asInstanceOf[Literal])).toArray))
    case StartsWith(a: Attribute, l: Literal) =>
      Option(l.value).collect {
        case s: org.apache.spark.unsafe.types.UTF8String =>
          v1.StringStartsWith(a.name, s.toString)
      }
    case _ => None
  }

  private def streamOf(p: LogicalPlan)
      : Option[graft.sources.VersionedMicroBatchStream] = p match {
    case r: StreamingDataSourceV2ScanRelation => r.stream match {
      case s: graft.sources.VersionedMicroBatchStream => Some(s)
      case _                                          => None
    }
    case _ => None
  }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    // A stream may be CONSUMED MORE THAN ONCE in one micro-batch plan
    // (self-union, branch-per-filter): pushing one branch's bounds would
    // zone-prune insert files for EVERY consumer and silently drop the
    // other branches' rows. Enumerate every occurrence with its direct
    // parent; push bounds only for a stream whose single occurrence sits
    // under a Filter, and push the EMPTY set otherwise — which also
    // clears bounds a prior micro-batch's plan may have handed over.
    val occ = scala.collection.mutable.LinkedHashMap
      .empty[graft.sources.VersionedMicroBatchStream, List[Option[Expression]]]
    val outs = scala.collection.mutable.Map
      .empty[graft.sources.VersionedMicroBatchStream, Map[ExprId, String]]
    def record(s: graft.sources.VersionedMicroBatchStream,
               c: Option[Expression]): Unit =
      occ.update(s, occ.getOrElse(s, Nil) :+ c)
    def recordOut(rel: LogicalPlan): Unit = streamOf(rel).foreach { s =>
      outs.getOrElseUpdate(s,
        rel.output.map(a => a.exprId -> a.name).toMap)
      ()
    }
    streamOf(plan).foreach(record(_, None)) // bare relation at the root
    recordOut(plan)
    plan.foreach {
      case Filter(cond, child) =>
        streamOf(child).foreach(record(_, Some(cond))); recordOut(child)
      case other =>
        other.children.foreach { ch =>
          streamOf(ch).foreach(record(_, None)); recordOut(ch)
        }
    }
    occ.foreach {
      case (s, List(one)) =>
        val split = one.toSeq.flatMap(splitConjunctivePredicates)
        val conjuncts = split.flatMap(toV1)
        s.updatePushedPredicates((conjuncts ++ joinKeyFilters(plan, s)).toArray)
        // MEMBERSHIP conjuncts ride their own channel (the v1 Filter
        // surface can't speak array_contains) — same extraction as the
        // batch rule, logical names rendered from the relation output
        val top = outs.getOrElse(s, Map.empty)
        s.updateMemberProbes(
          split.flatMap(PushMembershipProbes.probeOf(top, _)).distinct)
      case (s, _) =>
        s.updatePushedPredicates(Array.empty)
        s.updateMemberProbes(Nil)
    }
    plan
  }

  /** Runtime (DPP-style) key sets from stream–dimension joins: when the
    * single-occurrence stream sits under an equi-join whose OTHER side
    * is a small, fully-batch subplan, execute that side's key projection
    * (distinct, capped) on the driver and hand the observed keys to the
    * stream as an `In` — `planInputPartitions` then skips fresh files
    * whose zone maps hold none of the join's keys, per micro-batch, the
    * exact streaming twin of the batch scan's `SupportsRuntimeV2Filtering`
    * path. Sound because the stream occurs ONCE (every output row flows
    * through every ancestor join) and only join types that REQUIRE a
    * stream-side match participate: Inner/Cross either side, LeftSemi
    * stream-left, LeftOuter stream-right, RightOuter stream-left
    * (anti/full joins keep non-matching stream rows, so they push
    * nothing). Cost is bounded twice: the dimension's planner estimate
    * must fit the broadcast threshold, and more than [[MaxJoinKeys]]
    * distinct keys abandons the hand-off.
    */
  private[plans] val MaxJoinKeys = 10000

  private def joinKeyFilters(
      plan: LogicalPlan,
      s: graft.sources.VersionedMicroBatchStream): Seq[v1.Filter] = {
    def holds(p: LogicalPlan): Boolean =
      p.exists(n => streamOf(n).contains(s))
    def anyStream(p: LogicalPlan): Boolean =
      p.exists(_.isInstanceOf[StreamingDataSourceV2ScanRelation])
    // the relation's own output: join keys must reach it UNRENAMED
    // (exprId intact through Projects) so the pushed name is the
    // stream's logical column
    val relOut: Map[ExprId, String] = plan.collectFirst {
      case r: StreamingDataSourceV2ScanRelation if streamOf(r).contains(s) =>
        r.output.map(a => a.exprId -> a.name).toMap
    }.getOrElse(Map.empty)
    if (relOut.isEmpty) return Nil
    val spark = org.apache.spark.sql.SparkSession.active
    val threshold = spark.sessionState.conf.autoBroadcastJoinThreshold
    if (threshold <= 0) return Nil
    plan.collect {
      case j @ Join(l, r, jt, Some(cond), _)
          if holds(l) ^ holds(r) => (j, l, r, jt, cond)
    }.flatMap { case (_, l, r, jt, cond) =>
      val streamLeft = holds(l)
      val eligible = jt match {
        case Inner | Cross => true
        case LeftSemi | RightOuter => streamLeft
        case LeftOuter => !streamLeft
        case _ => false
      }
      val dim = if (streamLeft) r else l
      if (!eligible || anyStream(dim) ||
          dim.stats.sizeInBytes > threshold) Nil
      else {
        // a join key may be a TOP-LEVEL attribute or a STRUCT-LEAF
        // access chain (stream.meta.lang = dim.lang): the stream side
        // renders as the dotted leaf name its zone maps record; the dim
        // side wraps in an alias so the key projection stays executable.
        // NestedColumnAliasing extracts leaf accesses into Project
        // aliases below the join, so an attribute that is NOT relation
        // output resolves through the plan's alias map first — sound
        // because only pure GetStructField chains over relation output
        // ever render a name.
        lazy val aliases: Map[ExprId, Expression] = plan.collect {
          case p: Project => p.projectList.collect {
            case al: Alias => al.exprId -> al.child
          }
        }.flatten.toMap
        def streamLeaf(e: Expression): Option[String] = e match {
          case a: Attribute =>
            relOut.get(a.exprId)
              .orElse(aliases.get(a.exprId).flatMap(streamLeaf))
          case g: GetStructField =>
            streamLeaf(g.child).map(p => s"$p.${g.extractFieldName}")
          case _ => None
        }
        def dimSide(e: Expression): Option[NamedExpression] = {
          def rooted(x: Expression): Boolean = x match {
            case a: Attribute       => dim.outputSet.exists(_.exprId == a.exprId)
            case g: GetStructField  => rooted(g.child)
            case _                  => false
          }
          e match {
            case a: Attribute if rooted(a)      => Some(a)
            case g: GetStructField if rooted(g) => Some(Alias(g, "__graft_dk")())
            case _                              => None
          }
        }
        splitConjunctivePredicates(cond).flatMap {
          case EqualTo(x, y) =>
            val (sk, dk) = (streamLeaf(x), dimSide(y)) match {
              case (Some(s), Some(d)) => (Some(s), Some(d))
              case _ => (streamLeaf(y), dimSide(x)) match {
                case (Some(s), Some(d)) => (Some(s), Some(d))
                case _                  => (None, None)
              }
            }
            for {
              streamKey <- sk
              dimKey <- dk
              keys <- collectDimKeys(spark, dim, dimKey)
            } yield v1.In(streamKey, keys)
          case _ => None
        }
      }
    }
  }

  /** Distinct non-null key values of one dimension column, or None past
    * the cap (or for key types the zone probes don't speak). Runs a
    * driver-side job per micro-batch — bounded by the broadcast-threshold
    * gate above, the same cost DPP pays for its build-side subquery.
    *
    * Temporal and decimal keys convert HERE into the exact unit their
    * zone maps record — DATE to epoch-day ints (Catalyst's own internal
    * value), TIMESTAMP to epoch-micros longs, DECIMAL(≤18) to unscaled
    * longs — so the stream's `GraftFilters.inSets` consumes them through
    * the unchanged integral path and the per-file zone probe compares
    * like against like. DECIMAL past precision 18 records no zones and
    * declines.
    */
  private def collectDimKeys(
      spark: org.apache.spark.sql.SparkSession,
      dim: LogicalPlan, key: NamedExpression): Option[Array[Any]] = try {
    import org.apache.spark.sql.types.{
      DecimalType, IntegerType, LongType, StringType, TimestampType}
    val get: org.apache.spark.sql.catalyst.InternalRow => Any =
      key.dataType match {
        case LongType    => r => if (r.isNullAt(0)) null else Long.box(r.getLong(0))
        case IntegerType => r => if (r.isNullAt(0)) null else Int.box(r.getInt(0))
        case StringType  => r => if (r.isNullAt(0)) null else r.getUTF8String(0).toString
        case DateType    => // internal DATE value IS the epoch day
          r => if (r.isNullAt(0)) null else Int.box(r.getInt(0))
        case TimestampType => // internal value IS epoch micros (the zone unit)
          r => if (r.isNullAt(0)) null else Long.box(r.getLong(0))
        case d: DecimalType if d.precision <= 18 =>
          r => if (r.isNullAt(0)) null
            else Long.box(r.getDecimal(0, d.precision, d.scale).toUnscaledLong)
        // DOUBLE/FLOAT keys ride as boxed values: the stream's pushed
        // In-filter converts them to sortable bits under the tilde zone
        // key (zero literals widen to both signed representations there)
        case org.apache.spark.sql.types.DoubleType =>
          r => if (r.isNullAt(0)) null else Double.box(r.getDouble(0))
        case org.apache.spark.sql.types.FloatType =>
          r => if (r.isNullAt(0)) null else Float.box(r.getFloat(0))
        case _           => return None
      }
    val rows = spark.sessionState
      .executePlan(org.apache.spark.sql.catalyst.plans.logical.Distinct(
        Project(Seq(key), dim)))
      .executedPlan.executeTake(MaxJoinKeys + 1)
    if (rows.length > MaxJoinKeys) None
    else Some(rows.iterator.map(get).filter(_ != null).toArray)
  } catch { case scala.util.control.NonFatal(_) => None }
}
