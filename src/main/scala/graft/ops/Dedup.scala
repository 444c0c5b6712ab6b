package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication operators for LLM training-data pipelines over the
  * `documents` table: exact (hash-groupBy), MinHash+LSH near-dup, n-gram
  * Jaccard verification, and SimHash.
  *
  * Scale design (the part that matters at 100 TB):
  *   - NOTHING here is an all-pairs cross-join. Candidate generation is
  *     banded LSH: docs only meet if a band hash collides, so the join is
  *     an equi-join on (band, hash) buckets — shuffle is proportional to
  *     bucket sizes, not n².
  *   - Signatures are computed per-row with higher-order array functions
  *     (`transform`/`array_min`) — a single codegen'd map stage, no explode
  *     of shingles through a shuffle.
  *   - All hashing is md5-hex (lexicographic min of fixed-width hex ==
  *     numeric min), chosen deliberately so the DuckDB oracle can replay
  *     the exact algorithm; swap in xxhash64 for raw throughput when oracle
  *     parity is not needed.
  */
object Dedup {

  /** Exact dedup via content-hash groupBy: one partial/final hash aggregate
    * keyed on md5(text) — the canonical "hash-groupBy" exact dedup. Keeps
    * the min doc_id per group deterministically.
    */
  def exactDedup(documents: DataFrame): DataFrame =
    documents
      .groupBy(md5(col("text")).as("content_hash"))
      .agg(min("doc_id").as("keep_id"), count(lit(1)).as("copies"))
      .orderBy("keep_id")

  /** Character shingles at stride `step`: substring(text, i, width) for
    * i = 1, 1+step, … ≤ max(len-width+1, 1). Computed as an array column —
    * no explode.
    */
  private def shingles(text: Column, width: Int, step: Int): Column =
    transform(
      sequence(lit(1), greatest(length(text) - (width - 1), lit(1)), lit(step)),
      i => substring(text, i, lit(width)))

  /** One MinHash value: min over shingles of md5(seed || shingle).
    * Fixed-width lowercase hex ⇒ string min == numeric min.
    */
  private def minhash(sh: Column, seed: Int): Column =
    array_min(transform(sh, s => md5(concat(lit(seed.toString), s))))

  val NumHashes = 8
  val NumBands = 4
  val ShingleWidth = 8
  val ShingleStep = 4

  /** MinHash signatures: `NumHashes` md5-min values per doc, banded into
    * `NumBands` band hashes (md5 of the concatenated band slice). One
    * narrow map stage per doc.
    */
  def minhashSignatures(documents: DataFrame): DataFrame = {
    val sh = shingles(col("text"), ShingleWidth, ShingleStep)
    val hashes = (0 until NumHashes).map(k => minhash(sh, k).as(s"h$k"))
    val perBand = NumHashes / NumBands
    val withH = documents.select(col("doc_id") +: hashes: _*)
    val bands = (0 until NumBands).map { b =>
      val slice = (0 until perBand).map(j => col(s"h${b * perBand + j}"))
      md5(concat_ws("|", slice: _*)).as(s"band$b")
    }
    withH.select(col("doc_id") +: (0 until NumHashes).map(k => col(s"h$k")) ++: bands: _*)
      .orderBy("doc_id")
  }

  /** LSH candidate pairs: docs sharing any band hash. Implemented as a
    * band-bucket self-equi-join (shuffle on (band_idx, band_hash)), then
    * distinct pairs — never an all-pairs comparison. At scale, add a
    * bucket-size cap before the join to bound worst-case skew.
    */
  def lshCandidatePairs(documents: DataFrame): DataFrame = {
    val sigs = minhashSignatures(documents)
    val bandCols = (0 until NumBands).map(b =>
      struct(lit(b).as("band_idx"), col(s"band$b").as("band_hash")))
    val exploded = sigs
      .select(col("doc_id"), explode(array(bandCols: _*)).as("b"))
      .select(col("doc_id"), col("b.band_idx"), col("b.band_hash"))
    val a = exploded.alias("a")
    val b = exploded.alias("b")
    a.join(b,
        col("a.band_idx") === col("b.band_idx") &&
        col("a.band_hash") === col("b.band_hash") &&
        col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .distinct()
      .orderBy("doc_a", "doc_b")
  }

  /** Exact n-gram Jaccard similarity for the LSH candidate pairs (the
    * verify stage of near-dup detection): J(A,B) = |A∩B| / |A∪B| over
    * distinct shingle sets. Work is proportional to candidate pairs ×
    * shingles — the LSH prefilter keeps it off n².
    */
  def ngramJaccardNearDup(documents: DataFrame, minJaccard: Double = 0.2): DataFrame = {
    val pairs = lshCandidatePairs(documents)
    val docShingles = documents.select(
      col("doc_id"),
      array_distinct(shingles(col("text"), ShingleWidth, ShingleStep)).as("sh"))
    val withSets = pairs
      .join(docShingles.withColumnsRenamed(Map("doc_id" -> "doc_a", "sh" -> "sh_a")), Seq("doc_a"))
      .join(docShingles.withColumnsRenamed(Map("doc_id" -> "doc_b", "sh" -> "sh_b")), Seq("doc_b"))
    withSets
      .select(
        col("doc_a"),
        col("doc_b"),
        round(
          size(array_intersect(col("sh_a"), col("sh_b"))).cast("double") /
            size(array_union(col("sh_a"), col("sh_b"))).cast("double"),
          6).as("jaccard"))
      .filter(col("jaccard") >= minJaccard)
      .orderBy("doc_a", "doc_b")
  }

  val SimhashBits = 16

  /** SimHash: 16-bit fingerprint from token-level md5 bits by majority
    * vote. Tokens explode → per-doc aggregate of ±1 votes per bit →
    * fingerprint; one shuffle on doc_id (combine-heavy: partial sums
    * map-side). Near-dup docs differ in few bits (compare via Hamming
    * distance on the fingerprint).
    */
  def simhash(documents: DataFrame): DataFrame = {
    val toks = documents.select(
      col("doc_id"),
      explode(filter(
        split(lower(col("text")), "[^a-z0-9]+"),
        t => length(t) > 0)).as("tok"))
    // token hash: first 4 hex chars of md5 → 16-bit int
    val h = conv(substring(md5(col("tok")), 1, 4), 16, 10).cast("int")
    val votes = (0 until SimhashBits).map { b =>
      sum(when(shiftright(h, b).bitwiseAND(1) === 1, 1).otherwise(-1)).as(s"v$b")
    }
    val agg = toks.groupBy("doc_id").agg(votes.head, votes.tail: _*)
    val fp = (0 until SimhashBits).map { b =>
      when(col(s"v$b") > 0, lit(1 << b)).otherwise(lit(0))
    }.reduce(_ + _)
    agg.select(col("doc_id"), fp.cast("long").as("simhash16")).orderBy("doc_id")
  }
}
