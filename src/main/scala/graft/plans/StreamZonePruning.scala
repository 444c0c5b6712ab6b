package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
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
    def record(s: graft.sources.VersionedMicroBatchStream,
               c: Option[Expression]): Unit =
      occ.update(s, occ.getOrElse(s, Nil) :+ c)
    streamOf(plan).foreach(record(_, None)) // bare relation at the root
    plan.foreach {
      case Filter(cond, child) => streamOf(child).foreach(record(_, Some(cond)))
      case other =>
        other.children.foreach(ch => streamOf(ch).foreach(record(_, None)))
    }
    occ.foreach {
      case (s, List(Some(cond))) =>
        s.updatePushedPredicates(
          splitConjunctivePredicates(cond).flatMap(toV1).toArray)
      case (s, _) => s.updatePushedPredicates(Array.empty)
    }
    plan
  }
}
