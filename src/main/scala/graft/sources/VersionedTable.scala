package graft.sources

import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import scala.jdk.CollectionConverters._

/** Minimal versioned-table layout: immutable parquet data files plus a
  * per-version manifest listing exactly the files visible in that
  * snapshot — the metadata-layer pattern (Delta/Iceberg-style) that
  * gives a 100 TB table atomic commits, snapshot isolation, time
  * travel, merge-on-read deletes, and exactly-once streaming ingest
  * WITHOUT ever rewriting data for an append or a delete:
  *
  *   - every commit writes its rows to a fresh `data/c<N>/` directory
  *     (files are immutable once written, so concurrent readers of older
  *     snapshots are never disturbed);
  *   - the manifest (`_manifest/<N>.manifest`: `version=` line, optional
  *     `txn=` line, then one entry per line) is staged to a temp name
  *     and ATOMIC_MOVE-renamed — a reader either sees version N fully
  *     or not at all, which is the entire commit protocol;
  *   - a data entry is a relative path; a DELETE entry is
  *     `D:<bound>:<path>` — a parquet file of doomed keys that applies
  *     only to data commits ≤ `bound`, so a later re-insert of a
  *     deleted key is NOT swallowed by the old tombstone (the same
  *     commit-scoping that file-scoped deletion vectors provide);
  *   - a read pins ONE manifest, so long queries are isolated from
  *     later commits (snapshot isolation);
  *   - `vacuum` deletes files referenced only by expired manifests,
  *     keeping the newest `retain` versions readable;
  *   - `commitIfAbsent` makes a commit idempotent under a caller
  *     transaction id (recorded inside the atomically-renamed
  *     manifest), which is exactly what a foreachBatch streaming sink
  *     needs for exactly-once ingest across batch replays.
  *
  * Scale note: the manifest grows with FILE count, not row count —
  * ~800k lines for 100 TB at 128 MB files — and is only read on plan
  * construction. Production formats shard it (Iceberg manifest lists);
  * the single-file form keeps the commit protocol identical and obvious.
  */
object VersionedTable {

  private def manifestDir(table: String): Path = Paths.get(table, "_manifest")

  private def isDeleteEntry(e: String): Boolean = e.startsWith("D:")
  // entry grammar: ["D:<bound>:"] <path> ["#" <rows>]
  private def entryBody(e: String): String =
    if (isDeleteEntry(e)) e.split(":", 3)(2) else e
  private def entryPath(e: String): String = {
    val b = entryBody(e)
    val i = b.lastIndexOf('#')
    if (i < 0) b else b.substring(0, i)
  }
  private def dataCommitOf(e: String): Long =
    entryPath(e).split("/")(1).stripPrefix("c").toLong

  /** Committed versions, ascending (empty for a nonexistent table). */
  def versions(table: String): Seq[Long] = {
    val dir = manifestDir(table)
    if (!Files.isDirectory(dir)) Seq.empty
    else Files.list(dir).iterator.asScala
      .map(_.getFileName.toString)
      .collect { case s if s.endsWith(".manifest") => s.stripSuffix(".manifest").toLong }
      .toSeq.sorted
  }

  private def manifestLines(table: String, version: Long): Seq[String] =
    Files.readAllLines(manifestDir(table).resolve(s"$version.manifest"))
      .asScala.toSeq

  /** Entries (data + delete) of a version's manifest, prefix intact. */
  private def manifestEntries(table: String, version: Long): Seq[String] = {
    val lines = manifestLines(table, version)
    require(lines.nonEmpty && lines.head == s"version=$version",
      s"corrupt manifest for version $version")
    lines.tail.dropWhile(_.startsWith("txn="))
  }

  private def txnOf(table: String, version: Long): Option[String] =
    manifestLines(table, version).tail.headOption
      .filter(_.startsWith("txn=")).map(_.stripPrefix("txn="))

  /** A committed txn id → its version, for idempotent-ingest lookups. */
  def txnVersion(table: String, txnId: String): Option[Long] =
    versions(table).find(v => txnOf(table, v).contains(txnId))

  private def writeManifest(
      table: String, next: Long, entries: Seq[String], txnId: Option[String]): Long = {
    val mdir = manifestDir(table)
    Files.createDirectories(mdir)
    val tmp = mdir.resolve(s"$next.manifest.tmp")
    val header = s"version=$next" +: txnId.map(t => s"txn=$t").toSeq
    Files.write(tmp, (header ++ entries).asJava)
    Files.move(tmp, mdir.resolve(s"$next.manifest"),
      StandardCopyOption.ATOMIC_MOVE)
    next
  }

  private def writeFiles(df: DataFrame, table: String, next: Long): Seq[String] = {
    val dataDir = Paths.get(table, "data", s"c$next")
    df.write.mode("errorifexists").parquet(dataDir.toString)
    val files = Files.list(dataDir).iterator.asScala
      .map(_.getFileName.toString)
      .filter(n => n.endsWith(".parquet") && !n.startsWith("."))
      .toSeq.sorted
    // per-file row counts from the parquet FOOTERS (a count() over a bare
    // parquet scan reads only row-group metadata), recorded in the entry
    // as `path#rows` so snapshot counts become manifest arithmetic
    val counts = files.map { n =>
      df.sparkSession.read.parquet(s"$dataDir/$n").count()
    }
    files.zip(counts).map { case (n, c) => s"data/c$next/$n#$c" }
  }

  private def entryRows(e: String): Option[Long] = {
    val b = entryBody(e)
    val i = b.lastIndexOf('#')
    if (i < 0) None else Some(b.substring(i + 1).toLong)
  }

  /** Metadata-only row count of a snapshot: pure manifest arithmetic
    * over the per-entry footer counts recorded at commit time — no file
    * is opened, which at 100 TB is the difference between answering
    * `count(*)` from the transaction log and a full scan. Defined only
    * when every data entry carries a count and the snapshot has no
    * tombstones (a merge-on-read delete makes the physical row count an
    * overcount) — `None` in either case, and the caller falls back to
    * `read(...).count()`.
    */
  def fastCount(table: String, version: Option[Long] = None): Option[Long] = {
    val vs = versions(table)
    require(vs.nonEmpty, s"no committed versions at $table")
    val v = version.getOrElse(vs.last)
    val entries = manifestEntries(table, v)
    if (entries.exists(isDeleteEntry)) None
    else {
      val counts = entries.map(entryRows)
      if (counts.exists(_.isEmpty)) None else Some(counts.flatten.sum)
    }
  }

  /** Atomically commit `df` as the next version. `append=true` carries
    * the previous snapshot's entries forward (pure-metadata append —
    * no existing data is read or rewritten); `append=false` makes the
    * new files the entire snapshot (logical overwrite — old files stay
    * on disk for time travel until vacuumed). Returns the new version.
    */
  def commit(df: DataFrame, table: String, append: Boolean): Long =
    commitTxn(df, table, append, txnId = None)

  /** [[commit]] stamped with a transaction id inside the same atomic
    * manifest rename — the building block for [[commitIfAbsent]].
    */
  def commitTxn(
      df: DataFrame, table: String, append: Boolean, txnId: Option[String]): Long = {
    val prev = versions(table)
    val next = prev.lastOption.getOrElse(0L) + 1L
    val fresh = writeFiles(df, table, next)
    val carried =
      if (append && prev.nonEmpty) manifestEntries(table, prev.last) else Seq.empty
    writeManifest(table, next, carried ++ fresh, txnId)
  }

  /** Idempotent commit: if a version carrying `txnId` already exists,
    * do nothing and return None; else commit and return the version.
    * Because the txn id rides inside the atomically-renamed manifest,
    * a crashed-and-replayed writer can never double-apply — this is the
    * exactly-once contract a streaming foreachBatch sink keys on its
    * batchId (see `CdcStreamsSpec`'s ingest test).
    */
  def commitIfAbsent(
      df: DataFrame, table: String, append: Boolean, txnId: String): Option[Long] =
    txnVersion(table, txnId) match {
      case Some(_) => None
      case None    => Some(commitTxn(df, table, append, Some(txnId)))
    }

  /** Quality-gated idempotent commit: run the caller's expectation
    * check over the batch first; a failing batch is NOT committed and
    * the failure reason is returned, so a streaming foreachBatch sink
    * composes exactly-once ingest with a data-quality gate — bad
    * batches are quarantined (the caller decides where), never
    * poisoning the standing table. The check runs BEFORE any file is
    * written, so a rejected batch leaves no orphan data either.
    */
  def commitIfAbsentGated(
      df: DataFrame, table: String, append: Boolean, txnId: String)(
      check: DataFrame => Either[String, Unit]): Either[String, Option[Long]] =
    check(df) match {
      case Left(reason) => Left(reason)
      case Right(())    => Right(commitIfAbsent(df, table, append, txnId))
    }

  /** Merge-on-read delete: write the doomed KEYS as a tombstone file and
    * commit a manifest referencing it — no data file is rewritten. The
    * tombstone is bounded to the data commits existing NOW, so rows for
    * the same key appended by a LATER commit are visible again (delete
    * means "delete the rows present at delete time", not "ban the key").
    * Returns the new version.
    */
  def deleteWhere(
      spark: SparkSession, table: String, predicate: Column, keyCol: String): Long = {
    val prev = versions(table)
    require(prev.nonEmpty, s"no committed versions at $table")
    val lastV = prev.last
    val next = lastV + 1L
    val doomed = read(spark, table, Some(lastV))
      .filter(predicate).select(keyCol).distinct()
    val fresh = writeFiles(doomed, table, next)
    val bound = next - 1L
    writeManifest(table, next,
      manifestEntries(table, lastV) ++ fresh.map(p => s"D:$bound:$p"), None)
  }

  /** Rewrite the current merge-on-read view as a plain overwrite commit:
    * tombstones are applied once and dropped from the new manifest —
    * the OPTIMIZE step that turns read-time anti-joins back into pure
    * scans. Returns the new version.
    */
  def compact(spark: SparkSession, table: String): Long =
    commit(read(spark, table), table, append = false)

  /** Read a snapshot (latest when `version` is None). The returned plan
    * scans exactly the manifest's data files; any tombstone entries are
    * applied as an anti-join of doomed keys against the data commits
    * they are bounded to (delete frames are key-only and typically
    * broadcast). Later commits are invisible (snapshot isolation),
    * earlier versions stay readable (time travel).
    */
  def read(spark: SparkSession, table: String, version: Option[Long] = None): DataFrame =
    read(spark, table, version, mergeSchema = false)

  /** As [[read]], with opt-in SCHEMA EVOLUTION: `mergeSchema = true`
    * unions the column sets of every data commit in the snapshot, so a
    * later append that ADDED a column reads back with nulls for the
    * older files (additive evolution, the parquet mergeSchema
    * semantics). Off by default — schema merging footers costs a
    * metadata pass, and a fixed-schema table shouldn't pay it.
    */
  def read(
      spark: SparkSession, table: String, version: Option[Long],
      mergeSchema: Boolean): DataFrame = {
    val vs = versions(table)
    require(vs.nonEmpty, s"no committed versions at $table")
    val v = version.getOrElse(vs.last)
    require(vs.contains(v), s"version $v not in $vs")
    val entries = manifestEntries(table, v)
    def abs(rel: String) = Paths.get(table, rel).toString
    def readData(files: Seq[String]) =
      spark.read.option("mergeSchema", mergeSchema).parquet(files.map(abs): _*)
    val dataE = entries.filterNot(isDeleteEntry).map(entryPath)
    val delE = entries.filter(isDeleteEntry).map { e =>
      (e.split(":", 3)(1).toLong, entryPath(e))
    }
    if (delE.isEmpty) readData(dataE)
    else
      dataE.groupBy(dataCommitOf).toSeq.sortBy(_._1).map { case (c, files) =>
        val applicable = delE.collect { case (b, p) if b >= c => p }
        val df = readData(files)
        if (applicable.isEmpty) df
        else {
          val del = spark.read.parquet(applicable.map(abs): _*)
          df.join(del.select(del.columns.head).distinct(),
            Seq(del.columns.head), "left_anti")
        }
      }.reduce((a, b) => a.unionByName(b, allowMissingColumns = true))
  }

  /** Incremental consumption, additive side: the data rows added by the
    * commits in `(fromVersion, toVersion]`, each stamped with its
    * `_commit_version` — the table_changes surface a downstream consumer
    * polls with a checkpointed version cursor instead of rescanning
    * snapshots. Requires every commit in the range to be additive
    * (append or delete): an overwrite invalidates incremental
    * consumption by construction, so it fails loudly rather than
    * silently re-emitting the world.
    */
  def appendsBetween(
      spark: SparkSession, table: String,
      fromVersion: Long, toVersion: Long): DataFrame = {
    def abs(rel: String) = Paths.get(table, rel).toString
    val frames = rangeCommits(table, fromVersion, toVersion).flatMap {
      case (w, fresh) =>
        val data = fresh.filterNot(isDeleteEntry).map(entryPath)
        if (data.isEmpty) None
        else Some(spark.read.parquet(data.map(abs): _*)
          .withColumn("_commit_version",
            org.apache.spark.sql.functions.lit(w)))
    }
    require(frames.nonEmpty,
      s"no appended rows in ($fromVersion, $toVersion] of $table")
    frames.reduce(_ unionByName _)
  }

  /** Incremental consumption, removal side: the tombstoned keys of the
    * delete commits in `(fromVersion, toVersion]`, stamped with their
    * `_commit_version`.
    */
  def deletesBetween(
      spark: SparkSession, table: String,
      fromVersion: Long, toVersion: Long): DataFrame = {
    def abs(rel: String) = Paths.get(table, rel).toString
    val frames = rangeCommits(table, fromVersion, toVersion).flatMap {
      case (w, fresh) =>
        val del = fresh.filter(isDeleteEntry).map(entryPath)
        if (del.isEmpty) None
        else Some(spark.read.parquet(del.map(abs): _*)
          .withColumn("_commit_version",
            org.apache.spark.sql.functions.lit(w)))
    }
    require(frames.nonEmpty,
      s"no deletes in ($fromVersion, $toVersion] of $table")
    frames.reduce(_ unionByName _)
  }

  /** The fresh entries of each commit in `(from, to]`, oldest first,
    * failing on any non-additive (overwrite) commit in the range.
    */
  private def rangeCommits(
      table: String, from: Long, to: Long): Seq[(Long, Seq[String])] = {
    val vs = versions(table)
    require(vs.contains(to) && (from == 0L || vs.contains(from)) && from < to,
      s"bad version range ($from, $to] for versions $vs")
    vs.filter(w => w > from && w <= to).map { w =>
      val cur = manifestEntries(table, w)
      val prev = if (vs.contains(w - 1)) manifestEntries(table, w - 1) else Seq.empty
      require(prev.forall(cur.contains),
        s"commit $w of $table is an overwrite — incremental consumption " +
          "is only defined over append/delete commits")
      w -> cur.filterNot(prev.toSet)
    }
  }

  /** Expire all but the newest `retain` versions: delete their manifests
    * and any data/tombstone file no retained manifest references.
    * Returns the number of files deleted. Retained snapshots remain
    * exactly readable — vacuum never touches a referenced file.
    */
  def vacuum(table: String, retain: Int): Int = {
    require(retain >= 1, "must retain at least one version")
    val vs = versions(table)
    val (expired, kept) = vs.splitAt(math.max(0, vs.length - retain))
    val keep = kept.flatMap(manifestEntries(table, _)).map(entryPath).toSet
    val doomed =
      expired.flatMap(manifestEntries(table, _)).map(entryPath).toSet -- keep
    doomed.foreach(f => Files.deleteIfExists(Paths.get(table, f)))
    expired.foreach(v =>
      Files.deleteIfExists(manifestDir(table).resolve(s"$v.manifest")))
    doomed.size
  }
}
