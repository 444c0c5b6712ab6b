package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Ingest-time CDC: maintain a standing keyed view from a change stream,
  * the streaming twin of [[graft.ops.Incremental.cdcApply]]. Each key's
  * state is the single highest-`seq` change seen so far (last-writer-wins
  * across AND within micro-batches — a late change with a lower sequence
  * number than the standing one is ignored, the same cross-batch
  * out-of-order guard as the other state machines here). After every
  * micro-batch that touches a key, the key's current row is re-emitted in
  * Update mode; deletes emit a tombstone (`deleted = true`) so a
  * downstream materialized view can drop the key.
  *
  * Scale shape: state is ONE row per live key, partitioned by key across
  * state stores — it grows with the keyspace, never with change volume,
  * which is the property that lets a 100 TB change log maintain a
  * merely-large standing table.
  */
object CdcStreams {

  final case class Change(k: Long, op: String, seq: Long,
      status: Option[String], price_c: Option[Long])
  final case class RowState(seq: Long,
      deleted: Boolean, status: Option[String], price_c: Option[Long])
  final case class Upsert(k: Long, seq: Long, deleted: Boolean,
      status: Option[String], price_c: Option[Long])

  def cdcUpsertStream(changes: Dataset[Change]): Dataset[Upsert] = {
    val spark = changes.sparkSession
    import spark.implicits._
    changes
      .groupByKey(_.k)
      .flatMapGroupsWithState[RowState, Upsert](
        OutputMode.Update(), GroupStateTimeout.NoTimeout) {
        (k: Long, batch: Iterator[Change], state: GroupState[RowState]) =>
          val incoming = batch.toSeq
          val prev = state.getOption
          val best = (prev.toSeq.map(s =>
            Change(k, if (s.deleted) "D" else "U", s.seq, s.status, s.price_c)) ++
            incoming).maxBy(_.seq)
          val next = RowState(best.seq, best.op == "D", best.status, best.price_c)
          state.update(next)
          // re-emit only when this batch actually changed the standing row
          if (prev.contains(next)) Iterator.empty
          else Iterator.single(Upsert(k, next.seq, next.deleted, next.status, next.price_c))
      }
  }
}
