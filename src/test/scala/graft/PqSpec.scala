package graft

import graft.ops.Similarity
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Product-quantization suite: encode invariants, the ADC locality
  * property (PQ top-k retrieves genuinely nearer vectors than chance —
  * the thing a broken codebook or lookup-table indexing bug destroys
  * first), and the plan shape that makes the operators 100 TB-safe
  * (broadcast codebooks, no sort-merge/cartesian against the corpus).
  */
class PqSpec extends AnyFunSuite {

  private lazy val spark = SparkTestBase.spark

  private lazy val embs =
    spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")

  test("pqEncode: codes in [0, PqK), pq_code is the 4-bit packing of c0..c7") {
    val rows = Similarity.pqEncode(embs).collect()
    assert(rows.length == embs.count())
    rows.foreach { r =>
      val codes = (0 until Similarity.PqM).map(m => r.getLong(1 + m))
      codes.foreach(c => assert(c >= 0 && c < Similarity.PqK, s"code $c out of range"))
      val packed = codes.zipWithIndex.map { case (c, m) => c << (4 * m) }.sum
      assert(r.getAs[Long]("pq_code") == packed, s"packing mismatch at ${r.getLong(0)}")
    }
  }

  test("ADC top-k retrieves nearer-than-chance neighbors (locality survives quantization)") {
    import spark.implicits._
    // true squared-L2 of every (query, candidate) pair, query ids < 20
    val q = embs.filter(col("vec_id") < 20)
      .select(col("vec_id").as("query_id"), col("embedding").as("q_emb"))
    val c = embs.select(col("vec_id").as("cand_id"), col("embedding").as("c_emb"))
    val dot = graft.functions.VectorExpressions.vecDot _
    val trueL2 = q.hint("broadcast").join(c, col("query_id") =!= col("cand_id"))
      .select(col("query_id"), col("cand_id"),
        (dot(col("q_emb"), col("q_emb")) - lit(2.0) * dot(col("q_emb"), col("c_emb"))
          + dot(col("c_emb"), col("c_emb"))).as("l2"))
    val meanAll = trueL2.agg(avg("l2")).as[Double].head()
    val topk = Similarity.pqTopK(embs)
    val meanTop = topk.join(trueL2, Seq("query_id", "cand_id"))
      .agg(avg("l2")).as[Double].head()
    // the exact-search floor, for the recorded comparison: mean true L2²
    // of the TRUE top-5 per query
    val wf = org.apache.spark.sql.expressions.Window
      .partitionBy("query_id").orderBy(col("l2"), col("cand_id"))
    val meanExact = trueL2.withColumn("rnk", row_number().over(wf))
      .filter(col("rnk") <= 5).agg(avg("l2")).as[Double].head()
    info(f"mean true L2²: exact-top-5 $meanExact%.4f, ADC-top-5 $meanTop%.4f, corpus $meanAll%.4f")
    // This corpus is deliberately ISOTROPIC (see IvfRecallSpec): squared
    // L2 concentrates hard, so even exact top-5 sits near the mean and a
    // 16-codeword-per-subvector sketch keeps only a thin locality margin.
    // Measured (deterministic at sf0.001): exact 1.26, ADC 1.68, corpus
    // 2.00 → ratio 0.841. The assertion pins "statistically better than
    // chance" with margin — an indexing bug in the lookup table (e.g. an
    // off-by-one on idx) lands the ratio at ~1.0 and trips this.
    assert(meanTop < 0.9 * meanAll,
      f"ADC top-k no better than chance: $meanTop%.4f vs $meanAll%.4f")
    // exactly k rows per query, ranks 1..k
    val perQuery = topk.groupBy("query_id").agg(count(lit(1)).as("n"),
      max("rnk").as("mx")).collect()
    perQuery.foreach(r => assert(r.getLong(1) == 5 && r.getLong(2) == 5))
  }

  test("PQ plans stay broadcast-shaped: no sort-merge join, no cartesian product") {
    for (df <- Seq(Similarity.pqEncode(embs), Similarity.pqTopK(embs))) {
      val plan = df.queryExecution.executedPlan.toString
      assert(!plan.contains("SortMergeJoin"), s"corpus-wide shuffle join:\n$plan")
      assert(!plan.contains("CartesianProduct"), s"cartesian product:\n$plan")
    }
  }

  test("IVFADC restricts the ADC scan to the query's cell") {
    val full = Similarity.pqTopK(embs).count()
    val r = Similarity.ivfAdcTopK(embs)
    // every returned candidate must share the query's IVF cell — checked
    // against an independently computed assignment
    val assign = Similarity.ivfAssign(embs).collect()
      .map(x => x.getLong(0) -> x.getLong(1)).toMap
    val rows = r.collect()
    rows.foreach { x =>
      assert(assign(x.getLong(0)) == assign(x.getLong(2)),
        s"candidate ${x.getLong(2)} outside query ${x.getLong(0)}'s cell")
    }
    assert(rows.nonEmpty && full > 0)
    // the cell join must be an equi hash join, not a per-query NL scan
    val plan = r.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"cell join not hash-shaped:\n$plan")
  }

  test("RRF ranks both-list candidates above equal-rank single-list ones") {
    val fused = Similarity.rrfFusion(embs).collect()
    // k rows per query, scores within (0, 2/(60+1)]
    fused.groupBy(_.getLong(0)).foreach { case (_, rs) =>
      assert(rs.length == 5)
      assert(rs.map(_.getLong(1)).sorted.sameElements(1L to 5L))
    }
    fused.foreach { r =>
      val s = r.getDouble(3)
      // + 1e-6: the output edge rounds to 6 decimals, which can tip the
      // exact 2/(60+1) maximum up to the next grid point
      assert(s > 0.0 && s <= 2.0 / 61.0 + 1e-6, s"rrf score $s out of range")
    }
    // a candidate in BOTH lists at ranks (ra, rb) beats any single-list
    // candidate with min rank >= min(ra, rb): 1/(60+ra)+1/(60+rb) >
    // 1/(60+min). Verify on the data: every double-leg candidate present
    // outranks every single-leg candidate from the same query whose leg
    // rank is not better than both its ranks.
    val a = Similarity.ivfTopK(embs).collect()
      .map(r => (r.getLong(0), r.getLong(2)) -> r.getLong(1)).toMap
    val b = Similarity.pqTopK(embs).collect()
      .map(r => (r.getLong(0), r.getLong(2)) -> r.getLong(1)).toMap
    var checked = 0
    fused.groupBy(_.getLong(0)).foreach { case (q, rs) =>
      val withLegs = rs.map(r => (r.getLong(1), r.getLong(2),
        a.get((q, r.getLong(2))), b.get((q, r.getLong(2)))))
      for {
        (rnkD, _, Some(ra), Some(rb)) <- withLegs
        (rnkS, _, la, lb) <- withLegs
        if la.isEmpty || lb.isEmpty
        legRank = la.orElse(lb).get
        if legRank >= math.min(ra, rb)
      } {
        assert(rnkD < rnkS, s"query $q: both-list candidate ranked below single-list")
        checked += 1
      }
    }
    info(s"verified $checked double-vs-single dominance pairs")
  }
}
