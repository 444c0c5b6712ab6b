package org.apache.spark.sql

/** Bridge to `private[sql]` Spark internals the public API cannot reach.
  *
  * Motivation (the 100 TB bug this exists to kill): `Dataset.localCheckpoint`
  * truncates *lineage*, but the resulting `LogicalRDD` leaf deliberately
  * carries the origin plan's `Statistics` forward. In an iterative fixpoint
  * (connected components), each round's join estimate is a *product* of the
  * previous round's leaf stats, so the estimated `sizeInBytes` BigInt doubles
  * in digit count every round — after ~30 rounds the driver spends minutes
  * inside `BigInteger.multiply` under `SizeInBytesOnlyStatsPlanVisitor` and
  * planning livelocks (observed: a 512-vertex chain hung >20 min in stats
  * estimation while executors sat idle). Rebuilding the frame over the
  * already-checkpointed `RDD[InternalRow]` resets the leaf to
  * `defaultSizeInBytes` — constant per round — without copying data and
  * without the per-row deserialize/re-serialize map that the public
  * `createDataFrame(df.rdd, df.schema)` detour would add.
  */
object GraftSqlInternals {

  /** Wrap an already-resolved logical plan as a DataFrame. The public API
    * only builds plans through the DSL; a custom operator node (e.g.
    * [[graft.plans.AsOfJoinNode]]) needs this door to enter a Dataset.
    */
  def ofRows(spark: SparkSession, plan: catalyst.plans.logical.LogicalPlan): Dataset[Row] =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)

  /** Rebuild `df` as a fresh `LogicalRDD` leaf over its physical
    * `RDD[InternalRow]`, dropping inherited statistics. Call this on an
    * already-checkpointed frame: `toRdd` then wraps the checkpointed scan,
    * not a recomputation of the original lineage. (On a *lazily*
    * checkpointed frame the contract is preserved too — the first action on
    * the result materializes the checkpoint, exactly as it would have on
    * the input.)
    *
    * Built via `LogicalRDD.fromDataset` so the leaf keeps the physical
    * plan's output partitioning and ordering (what `localCheckpoint`'s own
    * leaf preserves — losing it would force a re-shuffle of data whose
    * layout Spark could reuse in the next fixpoint round); the rebuild
    * then strips ONLY the inherited `originStats`/`originConstraints`,
    * which are the per-round compounding source.
    */
  def resetLeafStats(df: Dataset[Row]): Dataset[Row] = {
    val ds = df.asInstanceOf[classic.Dataset[Row]]
    val withLayout = execution.LogicalRDD
      .fromDataset(ds.queryExecution.toRdd, ds, isStreaming = false)
    val statsFree = execution.LogicalRDD(
      withLayout.output,
      withLayout.rdd,
      withLayout.outputPartitioning,
      withLayout.outputOrdering,
      withLayout.isStreaming)(ds.sparkSession)
    classic.Dataset.ofRows(ds.sparkSession, statsFree)
  }

  /** `localCheckpoint` + stats reset that also KEEPS the frame's physical
    * layout. With AQE on (the default), `AdaptiveSparkPlanExec` advertises
    * `UnknownPartitioning` — AQE may still re-plan — so Spark's own
    * checkpoint leaf stores Unknown and every downstream consumer of the
    * checkpointed frame re-shuffles data that is already correctly
    * partitioned. After EXECUTION (eager checkpoint) the final physical
    * plan is frozen, so its partitioning is real; this recovers it from
    * `finalPhysicalPlan`, rewrites its attributes onto the checkpoint
    * leaf's output ids, and rebuilds the leaf stats-free (see
    * [[resetLeafStats]] for why the inherited stats must go).
    *
    * With `eager = false` the layout recovery is skipped (forcing
    * `finalPhysicalPlan` would materialize the frame, defeating the lazy
    * contract) and the behavior matches plain checkpoint + stats reset.
    */
  def localCheckpointStatsFree(df: Dataset[Row], eager: Boolean = true): Dataset[Row] = {
    import catalyst.expressions.{Attribute, AttributeMap, Expression}
    import catalyst.plans.physical.{Partitioning, PartitioningCollection, UnknownPartitioning}
    val ds = df.asInstanceOf[classic.Dataset[Row]]
    val cp = ds.localCheckpoint(eager).asInstanceOf[classic.Dataset[Row]]
    val leaf = cp.queryExecution.optimizedPlan.asInstanceOf[execution.LogicalRDD]
    @annotation.tailrec
    def firstLeafPartitioning(p: Partitioning): Partitioning = p match {
      case c: PartitioningCollection => firstLeafPartitioning(c.partitionings.head)
      case other => other
    }
    val part: Partitioning =
      if (!eager) leaf.outputPartitioning
      else {
        val physical = ds.queryExecution.executedPlan match {
          case a: execution.adaptive.AdaptiveSparkPlanExec => a.finalPhysicalPlan
          case p => p
        }
        val assoc = AttributeMap(physical.output.zip(leaf.output))
        firstLeafPartitioning(physical.outputPartitioning) match {
          case e: Expression with Partitioning if e.references.forall(assoc.contains) =>
            e.transform { case a: Attribute => assoc(a) }.asInstanceOf[Partitioning]
          case e: Expression with Partitioning => UnknownPartitioning(e.numPartitions)
          case p => p // SinglePartition / RoundRobin / Unknown — attribute-free
        }
      }
    val statsFree = execution.LogicalRDD(
      leaf.output, leaf.rdd, part, leaf.outputOrdering, leaf.isStreaming)(ds.sparkSession)
    classic.Dataset.ofRows(ds.sparkSession, statsFree)
  }
}
