package graft.sources

import java.util
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{
  InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder,
  SupportsPushDownRequiredColumns}
import org.apache.spark.sql.connector.read.streaming.{
  MicroBatchStream, Offset, ReadLimit, SupportsAdmissionControl}
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** Structured-Streaming source over a [[VersionedTable]]: COMMIT VERSIONS
  * ARE THE OFFSETS. Each micro-batch reads exactly the data files made
  * fresh by the commits in `(startVersion, endVersion]`, stamped with
  * `_commit_version` — the streaming form of
  * [[VersionedTable.appendsBetween]], and the same surface Delta's
  * streaming source exposes over its transaction log.
  *
  * Why version-offsets give exactly-once for free: manifests are
  * immutable once published (create-new link), so `planInputPartitions
  * (start, end)` is a pure function of the offsets — a restarted query
  * replans an uncommitted batch IDENTICALLY from the checkpoint, and a
  * committed batch is never re-read. No file-listing diffs, no
  * modification-time heuristics: the commit protocol is the offset log.
  *
  * Semantics on non-additive commits, mirroring `appendsBetween` (and
  * Delta's behavior): an OVERWRITE inside the offset range fails the
  * stream loudly — incremental consumption across a replaced snapshot is
  * undefined; a DELETE (merge-on-read tombstone) commit fails loudly
  * unless `ignoreDeletes=true`, which skips it (the downstream consumer
  * has already seen the rows; retraction is the CDF's job, not the
  * append stream's).
  *
  * Usage: `spark.readStream.format("graft-table").load(tablePath)`.
  * Reader scope: files are decoded with parquet's Group API via the
  * shared [[ParquetGroups]] decoder — primitives plus timestamps
  * (INT64 micros/millis and legacy INT96) and dates.
  */
class VersionedStreamSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-table"

  private def tablePath(options: CaseInsensitiveStringMap): String = {
    val p = options.get("path")
    require(p != null && p.nonEmpty, "graft-table requires .load(<table path>)")
    p
  }

  override def inferSchema(options: CaseInsensitiveStringMap): StructType = {
    val dataSchema =
      VersionedTable.read(SparkSession.active, tablePath(options)).schema
    val base = dataSchema.add("_commit_version", LongType, nullable = false)
    if (options.getBoolean("readChangeFeed", false))
      base.add("_change_type", StringType, nullable = false)
    else base
  }

  override def getTable(
      schema: StructType,
      partitioning: Array[Transform],
      properties: util.Map[String, String]): Table = {
    val opts = new CaseInsensitiveStringMap(properties)
    new VersionedStreamTable(tablePath(opts), schema,
      opts.getBoolean("ignoreDeletes", false),
      Option(opts.get("maxVersionsPerTrigger")).map(_.toLong),
      opts.getBoolean("readChangeFeed", false))
  }
}

class VersionedStreamTable(
    table: String, schema0: StructType, ignoreDeletes: Boolean,
    maxVersionsPerTrigger: Option[Long], changeFeed: Boolean = false)
    extends Table with SupportsRead {
  override def name(): String = s"graft_table($table)"
  override def schema(): StructType = schema0
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.MICRO_BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder with SupportsPushDownRequiredColumns {
      private var required: StructType = schema0
      // column pruning reaches the file reader: unprojected fields are
      // never decoded from the parquet groups
      override def pruneColumns(requiredSchema: StructType): Unit =
        required = requiredSchema
      override def build(): Scan = new Scan {
        override def readSchema(): StructType = required
        override def description(): String = s"graft-table stream over $table"
        override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
          new VersionedMicroBatchStream(table, required, ignoreDeletes,
            maxVersionsPerTrigger, changeFeed)
      }
    }
}

/** The stream position: the highest commit version fully emitted. */
case class VersionOffset(v: Long) extends Offset {
  override def json(): String = v.toString
}

class VersionedMicroBatchStream(
    table: String, schema: StructType, ignoreDeletes: Boolean,
    maxVersionsPerTrigger: Option[Long] = None, changeFeed: Boolean = false)
    extends MicroBatchStream with SupportsAdmissionControl {

  override def initialOffset(): Offset = VersionOffset(0L)
  override def latestOffset(): Offset =
    VersionOffset(VersionedTable.versions(table).lastOption.getOrElse(0L))
  // admission control: `maxVersionsPerTrigger` bounds each micro-batch to
  // a fixed number of commits, so a stream starting against a long table
  // history (or catching up after downtime) ingests in bounded units
  // instead of one giant initial batch — Delta's maxFilesPerTrigger shape
  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val s = start.asInstanceOf[VersionOffset].v
    val head = VersionedTable.versions(table).lastOption.getOrElse(0L)
    VersionOffset(maxVersionsPerTrigger.fold(head)(k => math.min(head, s + k)))
  }
  override def getDefaultReadLimit: ReadLimit = ReadLimit.allAvailable()
  override def deserializeOffset(json: String): Offset = VersionOffset(json.toLong)
  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[VersionOffset].v
    val e = end.asInstanceOf[VersionOffset].v
    def abs(rel: String) = java.nio.file.Paths.get(table, rel).toString
    VersionedTable.versions(table).filter(v => v > s && v <= e).flatMap { v =>
      val (freshData, freshDeletes, isOverwrite) =
        VersionedTable.commitClassFiles(table, v)
      if (isOverwrite)
        throw new IllegalStateException(
          s"streaming read of $table hit OVERWRITE commit $v — incremental " +
            "consumption across a replaced snapshot is undefined; restart " +
            "the stream from the overwrite as a fresh initial load")
      if (freshDeletes.nonEmpty && !ignoreDeletes && !changeFeed)
        throw new IllegalStateException(
          s"streaming read of $table hit DELETE commit $v; set " +
            "ignoreDeletes=true to skip tombstone commits, or " +
            "readChangeFeed=true to consume them as delete rows")
      val inserts = freshData.map(rel =>
        VersionedFilePartition(abs(rel), v, "insert"): InputPartition)
      // change-feed mode: tombstone files become key-only DELETE rows —
      // the reader nulls every column a tombstone file doesn't carry
      val deletes =
        if (changeFeed)
          freshDeletes.map(rel =>
            VersionedFilePartition(abs(rel), v, "delete"): InputPartition)
        else Seq.empty
      inserts ++ deletes
    }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new VersionedFileReaderFactory(schema)

  override def toString: String = s"graft-table-stream($table)"
}

case class VersionedFilePartition(
    file: String, commitVersion: Long, changeType: String = "insert")
    extends InputPartition

class VersionedFileReaderFactory(schema: StructType)
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    new VersionedFileReader(
      partition.asInstanceOf[VersionedFilePartition], schema)
}

/** Reads one immutable data file with parquet's Group API, projecting the
  * snapshot schema's fields by NAME (so the file's physical column order
  * never matters) and appending the partition's `_commit_version`.
  */
class VersionedFileReader(part: VersionedFilePartition, schema: StructType)
    extends PartitionReader[InternalRow] {
  import org.apache.parquet.example.data.Group

  private val fields = schema.fields // the PRUNED projection, in its order
  private val reader = org.apache.parquet.hadoop.ParquetReader
    .builder(new org.apache.parquet.hadoop.example.GroupReadSupport(),
      new org.apache.hadoop.fs.Path(part.file))
    .build()
  private var current: Group = _

  override def next(): Boolean = { current = reader.read(); current != null }

  override def get(): InternalRow = {
    val vals = new Array[Any](fields.length)
    var i = 0
    while (i < fields.length) {
      vals(i) = fields(i).name match {
        case "_commit_version" => part.commitVersion
        case "_change_type"    => UTF8String.fromString(part.changeType)
        case _                 => ParquetGroups.valueOf(current, fields(i))
      }
      i += 1
    }
    new GenericInternalRow(vals)
  }

  override def close(): Unit = reader.close()
}
