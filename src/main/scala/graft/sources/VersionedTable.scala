package graft.sources

import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import org.apache.spark.sql.{DataFrame, SparkSession}
import scala.jdk.CollectionConverters._

/** Minimal versioned-table layout: immutable parquet data files plus a
  * per-version manifest listing exactly the files visible in that
  * snapshot — the metadata-layer pattern (Delta/Iceberg-style) that
  * gives a 100 TB table atomic commits, snapshot isolation, and time
  * travel WITHOUT ever rewriting data for an append:
  *
  *   - every commit writes its rows to a fresh `data/c<N>/` directory
  *     (files are immutable once written, so concurrent readers of older
  *     snapshots are never disturbed);
  *   - the manifest (`_manifest/<N>.manifest`: version line + one
  *     relative file path per line) is staged to a temp name and
  *     ATOMIC_MOVE-renamed — a reader either sees version N fully or
  *     not at all, which is the entire commit protocol;
  *   - a read pins ONE manifest, so long queries are isolated from
  *     later commits (snapshot isolation);
  *   - `vacuum` deletes data files referenced only by expired manifests,
  *     keeping the newest `retain` versions readable.
  *
  * Scale note: the manifest grows with FILE count, not row count —
  * ~800k lines for 100 TB at 128 MB files — and is only read on plan
  * construction. Production formats shard it (Iceberg manifest lists);
  * the single-file form keeps the commit protocol identical and obvious.
  */
object VersionedTable {

  private def manifestDir(table: String): Path = Paths.get(table, "_manifest")

  /** Committed versions, ascending (empty for a nonexistent table). */
  def versions(table: String): Seq[Long] = {
    val dir = manifestDir(table)
    if (!Files.isDirectory(dir)) Seq.empty
    else Files.list(dir).iterator.asScala
      .map(_.getFileName.toString)
      .collect { case s if s.endsWith(".manifest") => s.stripSuffix(".manifest").toLong }
      .toSeq.sorted
  }

  private def manifestFiles(table: String, version: Long): Seq[String] = {
    val lines = Files.readAllLines(
      manifestDir(table).resolve(s"$version.manifest")).asScala
    require(lines.nonEmpty && lines.head == s"version=$version",
      s"corrupt manifest for version $version")
    lines.tail.toSeq
  }

  /** Atomically commit `df` as the next version. `append=true` carries
    * the previous snapshot's file list forward (pure-metadata append —
    * no existing data is read or rewritten); `append=false` makes the
    * new files the entire snapshot (logical overwrite — old files stay
    * on disk for time travel until vacuumed). Returns the new version.
    */
  def commit(df: DataFrame, table: String, append: Boolean): Long = {
    val prev = versions(table)
    val next = prev.lastOption.getOrElse(0L) + 1L
    val dataDir = Paths.get(table, "data", s"c$next")
    df.write.mode("errorifexists").parquet(dataDir.toString)
    val fresh = Files.list(dataDir).iterator.asScala
      .map(_.getFileName.toString)
      .filter(n => n.endsWith(".parquet") && !n.startsWith("."))
      .toSeq.sorted
      .map(n => s"data/c$next/$n")
    val carried =
      if (append && prev.nonEmpty) manifestFiles(table, prev.last) else Seq.empty
    val mdir = manifestDir(table)
    Files.createDirectories(mdir)
    val tmp = mdir.resolve(s"$next.manifest.tmp")
    Files.write(tmp, (s"version=$next" +: (carried ++ fresh)).asJava)
    Files.move(tmp, mdir.resolve(s"$next.manifest"),
      StandardCopyOption.ATOMIC_MOVE)
    next
  }

  /** Read a snapshot (latest when `version` is None). The returned plan
    * scans exactly the manifest's file list — later commits are
    * invisible (snapshot isolation), earlier versions stay readable
    * (time travel).
    */
  def read(spark: SparkSession, table: String, version: Option[Long] = None): DataFrame = {
    val vs = versions(table)
    require(vs.nonEmpty, s"no committed versions at $table")
    val v = version.getOrElse(vs.last)
    require(vs.contains(v), s"version $v not in $vs")
    val paths = manifestFiles(table, v).map(f => Paths.get(table, f).toString)
    spark.read.parquet(paths: _*)
  }

  /** Expire all but the newest `retain` versions: delete their manifests
    * and any data file no retained manifest references. Returns the
    * number of data files deleted. Retained snapshots remain exactly
    * readable — vacuum never touches a referenced file.
    */
  def vacuum(table: String, retain: Int): Int = {
    require(retain >= 1, "must retain at least one version")
    val vs = versions(table)
    val (expired, kept) = vs.splitAt(math.max(0, vs.length - retain))
    val keep = kept.flatMap(manifestFiles(table, _)).toSet
    val doomed = expired.flatMap(manifestFiles(table, _)).toSet -- keep
    doomed.foreach(f => Files.deleteIfExists(Paths.get(table, f)))
    expired.foreach(v =>
      Files.deleteIfExists(manifestDir(table).resolve(s"$v.manifest")))
    doomed.size
  }
}
