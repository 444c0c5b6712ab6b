package graft

import graft.ops.{Dedup, TextAnalysis}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Focused equivalence pins for the round-20 execution rewrites: each case
  * runs the rewritten operator against its legacy formulation (via the
  * session-conf A/B gate where one exists, or the legacy plan rebuilt
  * inline where the rewrite replaced the formulation outright) and asserts
  * row-identical results. These complement the DuckDB oracle: the oracle
  * proves the registered query's values; these pin the INTERNAL gate
  * wiring so a future default flip cannot silently change semantics.
  */
class R20RewriteSpec extends AnyFunSuite {

  private lazy val spark = SparkTestBase.spark

  private def withConf[T](kv: (String, String)*)(body: => T): T = {
    kv.foreach { case (k, v) => spark.conf.set(k, v) }
    try body finally kv.foreach { case (k, _) => spark.conf.unset(k) }
  }

  private def docs = {
    val s = spark; import s.implicits._
    Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta", "src0"),
      (2L, "alpha beta gamma delta epsilon zeta eta theta", "src1"),
      (3L, "alpha beta gamma delta iota kappa lambda mu", "src1"),
      (4L, "completely different words here nothing shared at all", "src2"),
      (5L, "the quick brown fox and a lazy dog with the usual filler text", "src2"),
      (6L, "the quick brown fox and a lazy dog with the usual filler text", "src0"),
      (7L, "short", "src1")
    ).toDF("doc_id", "text", "source")
  }

  private def collectSorted(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.collect().map(_.toString).toSeq.sorted

  test("bidirectional-edge explode ≡ legacy union form (LP, PageRank, stars)") {
    val s = spark; import s.implicits._
    val pairs = Seq((1L, 2L), (2L, 3L), (5L, 6L), (1L, 3L), (4L, 9L))
      .toDF("doc_a", "doc_b")
    val verts = (1L to 9L).map(Tuple1(_)).toDF("doc_id")
    def all() = Seq(
      collectSorted(Dedup.labelPropagationOnPairs(pairs, verts, 3)),
      collectSorted(Dedup.pageRankFromPairs(pairs, verts.toDF("doc_id"))),
      collectSorted(Dedup.connectedComponentsStars(
        Dedup.starReduceEdges(pairs), verts)))
    val now = all()
    SparkEntry.resetSessionState(spark)
    val legacy = withConf("spark.graft.bidirUnion" -> "true")(all())
    SparkEntry.resetSessionState(spark)
    assert(now == legacy, "explode and union bidirection must be row-identical")
  }

  test("LP single-exchange vote ≡ two-exchange chain") {
    val s = spark; import s.implicits._
    // vote-sensitive shape: ties and majority flips must break identically
    val pairs = Seq((1L, 2L), (1L, 3L), (2L, 3L), (3L, 4L), (4L, 5L), (4L, 6L), (5L, 6L))
      .toDF("doc_a", "doc_b")
    val verts = (1L to 8L).map(Tuple1(_)).toDF("doc_id")
    val now = collectSorted(Dedup.labelPropagationOnPairs(pairs, verts, 3))
    SparkEntry.resetSessionState(spark)
    val legacy = withConf("spark.graft.lpVoteRepartition" -> "false")(
      collectSorted(Dedup.labelPropagationOnPairs(pairs, verts, 3)))
    SparkEntry.resetSessionState(spark)
    assert(now == legacy, "repartitioned vote must be row-identical")
  }

  test("contraction CC active-set labels ≡ full-vertex iteration (singletons kept)") {
    val s = spark; import s.implicits._
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("doc_a", "doc_b")
    val verts = (Seq(1L, 2L, 3L, 10L, 11L) ++ Seq(20L, 21L)).map(Tuple1(_)).toDF("doc_id")
    val now = collectSorted(Dedup.connectedComponents(pairs, verts, maxIter = 20))
    SparkEntry.resetSessionState(spark)
    val legacy = withConf("spark.graft.activeSetLegacy" -> "true")(
      collectSorted(Dedup.connectedComponents(pairs, verts, maxIter = 20)))
    SparkEntry.resetSessionState(spark)
    assert(now == legacy, "active-set labels must be row-identical, singletons self-kept")
    assert(now.exists(_.contains("[20,20,true]")), s"singleton 20 must self-keep: $now")
  }

  test("contraction lazy-nbrMin fuse + overlapped contraction ≡ sequential eager loop") {
    val s = spark; import s.implicits._
    // a chain long enough to exercise several rounds plus a separate clique
    val chain = (1L until 40L).map(i => (i, i + 1))
    val clique = Seq((100L, 101L), (100L, 102L), (101L, 102L))
    val pairs = (chain ++ clique).toDF("doc_a", "doc_b")
    val verts = ((1L to 40L) ++ Seq(100L, 101L, 102L, 500L)).map(Tuple1(_)).toDF("doc_id")
    val now = collectSorted(Dedup.connectedComponents(pairs, verts, maxIter = 30))
    SparkEntry.resetSessionState(spark)
    val legacy = withConf(
      "spark.graft.ccNbrMinLazy" -> "false",
      "spark.graft.ccContractOverlap" -> "false")(
      collectSorted(Dedup.connectedComponents(pairs, verts, maxIter = 30)))
    SparkEntry.resetSessionState(spark)
    assert(now == legacy, "fused/overlapped contraction must be row-identical")
  }

  test("ngramContamination gram-window form ≡ legacy aggregate + join-back") {
    val n = 3
    val out = collectSorted(TextAnalysis.ngramContamination(docs, n))
    // legacy formulation rebuilt verbatim (r19 shape)
    val withWords = docs.select(
      col("doc_id"), col("source"),
      graft.functions.TextExpressions.alnumTokens(col("text")).as("words"))
    val exploded = withWords
      .select(col("doc_id"), col("source"),
        explode(graft.functions.TextExpressions.hashedNgrams(col("words"), n)).as("gram"))
    val leaky = exploded
      .groupBy("gram").agg(countDistinct("source").as("n_sources"))
      .filter(col("n_sources") > 1).select("gram")
    val legacy = collectSorted(
      exploded.join(leaky, Seq("gram"))
        .groupBy("doc_id").agg(countDistinct("gram").as("leaked_grams"))
        .orderBy("doc_id"))
    assert(out == legacy, "window and join contamination counts must match")
    assert(out.nonEmpty, "fixture must actually leak grams across sources")
  }

  test("one-scan quality projections ≡ legacy join-back (dedupKeepBest, topQualityPerSource)") {
    val out1 = collectSorted(TextAnalysis.dedupKeepBest(docs))
    val out2 = collectSorted(TextAnalysis.topQualityPerSource(docs, n = 2))
    // legacy formulation: score separately, join back on doc_id
    val q = TextAnalysis.qualityScore(docs).select("doc_id", "quality")
    val legacy1 = collectSorted(
      q.join(docs.select(col("doc_id"), col("text")), Seq("doc_id"))
        .groupBy(md5(col("text")).as("content_hash"))
        .agg(
          max_by(col("doc_id"), struct(col("quality"), -col("doc_id"))).as("best_id"),
          max("quality").as("best_quality"),
          count(lit(1)).as("copies"))
        .orderBy("best_id"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("source").orderBy(col("quality").desc, col("doc_id"))
    val legacy2 = collectSorted(
      q.join(docs.select("doc_id", "source"), Seq("doc_id"))
        .withColumn("rnk", row_number().over(w).cast("long"))
        .filter(col("rnk") <= 2)
        .select(col("source"), col("rnk"), col("doc_id"), col("quality"))
        .orderBy("source", "rnk"))
    assert(out1 == legacy1, "one-scan dedupKeepBest must equal join-back form")
    assert(out2 == legacy2, "one-scan topQualityPerSource must equal join-back form")
  }

  test("native minhash mins ≡ HOF md5/affine chain (banded signatures)") {
    val s = spark; import s.implicits._
    // include unicode, short, and empty-ish texts so the md5 byte handling
    // and the size>0 filter are both exercised
    val d = Seq(
      (1L, "alpha beta gamma delta epsilon"),
      (2L, "übermäßig sträußchen çörek 文字 text"),
      (3L, "xy"),
      (4L, "the quick brown fox jumps over the lazy dog repeatedly")
    ).toDF("doc_id", "text")
    val now = collectSorted(Dedup.bandedSignatures(d))
    SparkEntry.resetSessionState(spark)
    val hof = withConf("spark.graft.minhashHof" -> "true")(
      collectSorted(Dedup.bandedSignatures(d)))
    SparkEntry.resetSessionState(spark)
    assert(now == hof, "native and HOF banded signatures must be row-identical")
    assert(now.nonEmpty)
  }

  test("native hex n-grams ≡ HOF slice/concat/md5 chain (setsim + substring dedup)") {
    val s = spark; import s.implicits._
    val d = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta alpha beta gamma"),
      (2L, "alpha beta gamma delta different tail entirely here now okay"),
      (3L, "übermäßig sträußchen çörek tokens with unicode content mixed in"),
      (4L, "tiny doc"),
      (5L, "alpha beta gamma delta epsilon zeta eta theta alpha beta gamma")
    ).toDF("doc_id", "text")
    def all() = Seq(
      collectSorted(Dedup.setSimilarityJoin(d, t = 0.3)),
      collectSorted(Dedup.substringDedup(d, k = 4)),
      collectSorted(Dedup.substringDedupApply(d, k = 4)))
    val now = all()
    SparkEntry.resetSessionState(spark)
    val hof = withConf("spark.graft.gramHof" -> "true")(all())
    SparkEntry.resetSessionState(spark)
    assert(now == hof, "native and HOF gram hashing must be row-identical")
    assert(now.head.nonEmpty && now(1).nonEmpty)
  }

  test("native fuzzy variant hashes ≡ nested-HOF masked-gram chain") {
    val s = spark; import s.implicits._
    val d = Seq(
      (1L, "question what is the answer to this benchmark item", "src0"),
      (2L, "question what is the answer to that benchmark item", "src1"),
      (3L, "über tokens with unicode content here too now", "src1"),
      (4L, "short one", "src2"),
      (5L, "question what is the answer to this benchmark item", "src2")
    ).toDF("doc_id", "text", "source")
    val now = collectSorted(graft.ops.TextAnalysis.fuzzyContamination(d, "src0", n = 4))
    SparkEntry.resetSessionState(spark)
    val hof = withConf("spark.graft.gramHof" -> "true")(
      collectSorted(graft.ops.TextAnalysis.fuzzyContamination(d, "src0", n = 4)))
    SparkEntry.resetSessionState(spark)
    assert(now == hof, "native and HOF fuzzy variants must be row-identical")
    assert(now.nonEmpty, "fixture must produce fuzzy hits")
  }

  test("tfidf df-from-tf ≡ distinct-based document frequency") {
    val out = collectSorted(TextAnalysis.tfidfTopTerms(docs, k = 2))
    SparkEntry.resetSessionState(spark)
    val nRow = docs.agg(count(lit(1)).as("g_n"))
    val toks = docs.select(
      col("doc_id"),
      explode(graft.functions.TextExpressions.alnumTokens(col("text"), minLen = 3))
        .as("term"))
    val tf = toks.groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
    val dfreq = toks.select("doc_id", "term").distinct()
      .groupBy("term").agg(count(lit(1)).as("df"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("doc_id").orderBy(col("score").desc, col("term"))
    val legacy = collectSorted(
      tf.join(dfreq, Seq("term"))
        .crossJoin(broadcast(nRow))
        .withColumn("score",
          col("tf") * log((col("g_n") + lit(1.0)) / (col("df") + lit(1.0))))
        .withColumn("rnk", row_number().over(w).cast("long"))
        .filter(col("rnk") <= 2)
        .select(col("doc_id"), col("rnk"), col("term"), col("tf"), col("df"),
          round(col("score"), 6).as("tfidf"))
        .orderBy("doc_id", "rnk"))
    assert(out == legacy, "tf-derived df must equal distinct-based df")
  }
}
