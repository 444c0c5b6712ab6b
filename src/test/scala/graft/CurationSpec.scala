package graft

import graft.ops.{Dedup, TextAnalysis}
import org.scalatest.funsuite.AnyFunSuite

/** The sf corpus contains no exact-duplicate text (500 docs, 500 distinct
  * hashes), so the dedup/contamination queries pass vacuously against the
  * oracle. This spec constructs real duplicates to pin the semantics.
  */
class CurationSpec extends AnyFunSuite {

  private lazy val spark = SparkTestBase.spark

  private def docs = {
    val sparkS = spark
    import sparkS.implicits._
    Seq(
      // doc 1 and 3: same text, different source (contamination + dup)
      (1L, "the quick brown fox jumps over the lazy dog and runs far away home", "en", "web", 60L),
      (2L, "completely different text about the weather and the sea and a storm", "en", "web", 60L),
      (3L, "the quick brown fox jumps over the lazy dog and runs far away home", "en", "books", 60L),
      // doc 4: same as 1/3 modulo whitespace — contaminated but not exact-dup
      (4L, "the quick  brown fox jumps over the lazy dog and runs far away  home", "en", "wiki", 61L),
      (5L, "short", "en", "web", 5L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
  }

  test("exact dedup groups identical text and keeps the min id") {
    val r = Dedup.exactDedup(docs).collect()
    val byKeep = r.map(x => x.getLong(1) -> x.getLong(2)).toMap
    assert(byKeep(1L) == 2L) // docs 1 and 3 collapse, keep 1
    assert(byKeep(2L) == 1L)
    assert(byKeep(4L) == 1L) // whitespace variant is NOT an exact dup
    assert(r.length == 4)
  }

  test("keep-best dedup selects the highest-quality copy") {
    val r = TextAnalysis.dedupKeepBest(docs).collect()
    val dup = r.filter(_.getLong(3) == 2L)
    assert(dup.length == 1)
    assert(dup(0).getLong(1) == 1L) // equal quality → lowest doc_id wins
  }

  test("contamination detects normalized-identical text across sources") {
    val r = TextAnalysis.crossSourceContamination(docs).collect()
    assert(r.length == 1)
    // whitespace-normalization folds doc 4 in with 1 and 3; output edge
    // ships canonical comma-joined text, not arrays (driver hashability)
    assert(r(0).getString(1) == "books,web,wiki")
    assert(r(0).getString(2) == "1,3,4")
    assert(r(0).getLong(3) == 3L)
  }

  test("connected components collapses transitive chains and keeps singletons") {
    val sparkS = spark
    import sparkS.implicits._
    // chain 1-2-3 (1 and 3 never share an edge), pair 10-11, singleton 5
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("doc_a", "doc_b")
    val verts = Seq(1L, 2L, 3L, 5L, 10L, 11L).toDF("doc_id")
    val r = Dedup.connectedComponents(pairs, verts)
      .collect().map(x => x.getLong(0) -> (x.getLong(1), x.getBoolean(2))).toMap
    assert(r(1L) == (1L, true))
    assert(r(2L) == (1L, false)) // transitivity: 3 reaches 1 through 2
    assert(r(3L) == (1L, false))
    assert(r(5L) == (5L, true)) // singleton keeps itself
    assert(r(10L) == (10L, true))
    assert(r(11L) == (10L, false))
  }

  test("near-dup clusters over real LSH pairs fold exact duplicates together") {
    val r = Dedup.nearDupClusters(docs).collect()
      .map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(r(1L) == 1L && r(3L) == 1L) // identical docs 1/3 share a cluster
    assert(r(2L) == 2L)                // unrelated doc is its own cluster
    assert(r.size == 5)                // every doc appears
  }

  test("PII redaction detects and scrubs emails/IPs/phones (corpus has none — pin it here)") {
    val sparkS = spark
    import sparkS.implicits._
    val pii = Seq(
      (1L, "contact alice@example.com or bob.smith+x@mail.co.uk today"),
      (2L, "server at 192.168.1.100 and 10.0.0.1 responded"),
      (3L, "call +1-555-123-4567 now"),
      (4L, "clean text with no identifiers at all"))
      .toDF("doc_id", "text")
    val r = TextAnalysis.redactPii(pii).collect()
    assert(r(0).getLong(1) == 2L) // two emails
    assert(r(1).getLong(2) == 2L) // two IPs
    assert(r(3).getLong(1) == 0L && r(3).getLong(2) == 0L)
    // the hash proves redaction actually rewrote the text (≠ hash of raw)
    import org.apache.spark.sql.functions.{col, md5}
    val raw = pii.select(md5(col("text"))).collect().map(_.getString(0))
    assert(r(0).getString(3) != raw(0))
    assert(r(2).getString(3) != raw(2)) // phone scrubbed even though uncounted
    assert(r(3).getString(3) == raw(3)) // clean text untouched
  }

  test("n-gram contamination flags partial inclusion that whole-doc hashing misses") {
    val sparkS = spark
    import sparkS.implicits._
    val shared = (1 to 15).map(i => s"w$i").mkString(" ") // 15 shared words
    val docs = Seq(
      (1L, s"intro text then $shared and a tail", "web"),
      (2L, s"$shared completely different ending here", "eval"),
      (3L, "nothing in common with the others at all beyond tiny words", "web"))
      .toDF("doc_id", "text", "source")
    val r = TextAnalysis.ngramContamination(docs).collect()
      .map(x => x.getLong(0) -> x.getLong(1)).toMap
    // 15 shared words → 3 shared 13-grams; both docs flagged, doc 3 not
    assert(r(1L) == 3L && r(2L) == 3L)
    assert(!r.contains(3L))
    // whole-doc fingerprinting sees nothing here (texts differ)
    assert(TextAnalysis.crossSourceContamination(docs).count() == 0L)
  }

  test("Bloom decontamination never misses a true overlap (no false negatives)") {
    val sparkS = spark
    import sparkS.implicits._
    val shared = (1 to 15).map(i => s"w$i").mkString(" ")
    val docs = Seq(
      (10L, s"benchmark passage containing $shared exactly once", "src0"),
      (20L, s"corpus doc that copied $shared verbatim from the benchmark", "web"),
      (30L, "an unrelated corpus document sharing nothing with the benchmark "
        + "and padded out to well over thirteen distinct words total", "web"))
      .toDF("doc_id", "text", "source")
    val r = TextAnalysis.bloomDecontaminate(docs).collect()
      .map(x => x.getLong(0) -> x.getAs[Boolean]("flagged")).toMap
    assert(r(20L), "a verbatim 13-gram overlap MUST hit the filter")
    assert(!r(30L), "clean doc false-positived (possible but ~0 at this load)")
    assert(!r.contains(10L), "benchmark docs are the build side, not probed")
  }

  test("Bloom flags are a superset of exact n-gram contamination vs the same source") {
    // the defining containment: every doc the EXACT gram join would flag
    // against src0 must also be flagged by the Bloom probe — on the real
    // corpus, not just synthetic rows
    val real = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val bloom = TextAnalysis.bloomDecontaminate(real).collect()
      .filter(_.getAs[Boolean]("flagged")).map(_.getLong(0)).toSet
    // exact overlap vs src0, computed independently of the operator under
    // test: hashed 13-grams, semi-join against the src0 gram set
    import org.apache.spark.sql.functions._
    val grams = real.select(col("doc_id"), col("source"),
      explode(graft.functions.TextExpressions.hashedNgrams(
        graft.functions.TextExpressions.alnumTokens(col("text")), 13)).as("gram"))
    val benchGrams = grams.filter(col("source") === "src0").select("gram").distinct()
    val exact = grams.filter(col("source") =!= "src0")
      .join(benchGrams, Seq("gram")).select("doc_id").distinct()
      .collect().map(_.getLong(0)).toSet
    info(s"exact overlaps: ${exact.size}, bloom-flagged: ${bloom.size}")
    assert(exact.subsetOf(bloom),
      s"false negatives: ${(exact -- bloom).take(5).mkString(", ")}")
  }

  test("stratified sampling takes exactly perSource docs per stratum, partition-independent") {
    val real = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val r = TextAnalysis.stratifiedSample(real, perSource = 3).collect()
    val bySource = r.groupBy(_.getString(0))
    assert(bySource.size == 20) // every source represented
    bySource.values.foreach(rs => assert(rs.length == 3))
    // determinism under repartitioning: the draw is a pure id function
    val r2 = TextAnalysis.stratifiedSample(real.repartition(7), perSource = 3)
      .collect().map(x => (x.getString(0), x.getLong(2))).toSet
    assert(r2 == r.map(x => (x.getString(0), x.getLong(2))).toSet)
  }

  test("unigram logprob scores rare-token docs as more surprising") {
    val sparkS = spark
    import sparkS.implicits._
    val common = Seq.fill(30)("the cat sat on the mat with the hat")
      .zipWithIndex.map { case (t, i) => (i.toLong, t, "web") }
    val docs = (common :+ (99L, "zygomorphic quasar phlogiston epistemology", "web"))
      .toDF("doc_id", "text", "source")
    val r = TextAnalysis.unigramLogProb(docs).collect()
      .map(x => x.getLong(0) -> x.getDouble(2)).toMap
    // the all-rare-tokens doc must out-surprise every boilerplate copy
    assert(r(99L) > r(0L) * 1.5,
      s"rare-token doc ${r(99L)} not above boilerplate ${r(0L)}")
  }

  test("mixture sampling honors per-source rates and drops unknown sources") {
    val sparkS = spark
    import sparkS.implicits._
    val many = (1L to 400L).map(i =>
      (i, "text", "en", if (i <= 200) "keep_all" else if (i <= 390) "keep_none" else "other", 4L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val r = TextAnalysis.mixtureSample(many,
      Map("keep_all" -> 10000, "keep_none" -> 0))
      .collect()
    assert(r.length == 200) // all of keep_all
    assert(r.forall(_.getString(1) == "keep_all")) // keep_none + unknown dropped
    // determinism: repartitioned input selects the identical subset
    val r2 = TextAnalysis.mixtureSample(many.repartition(7),
      Map("keep_all" -> 10000, "keep_none" -> 0))
      .collect().map(_.getLong(0)).toSet
    assert(r2 == r.map(_.getLong(0)).toSet)
  }

  test("temperature mixture keeps all of the smallest source and thins the largest") {
    val sparkS = spark
    import sparkS.implicits._
    val docs = (1L to 416L).map(i =>
      (i, "text", "en", if (i <= 400) "big" else "small", 4L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val r = TextAnalysis.temperatureMixture(docs).collect()
    val bySrc = r.groupBy(_.getString(1)).map { case (s, rs) => s -> rs.length }
    // rate_small = sqrt(16/16) = 1 → every small doc kept
    assert(bySrc.getOrElse("small", 0) == 16, s"got $bySrc")
    // rate_big = sqrt(16/400) = 0.2 → ~80 of 400 (hash-dependent margin)
    val big = bySrc.getOrElse("big", 0)
    assert(big > 40 && big < 140, s"expected ~80 of 400 kept, got $big")
    // the reported keep_rate is the exact threshold ratio
    assert(r.filter(_.getString(1) == "big")
      .forall(row => math.abs(row.getDouble(3) - 0.2) < 1e-6))
    // determinism under repartitioning (pure doc_id-hash membership)
    val r2 = TextAnalysis.temperatureMixture(docs.repartition(7))
      .collect().map(_.getLong(0)).toSet
    assert(r2 == r.map(_.getLong(0)).toSet)
  }

  test("repetition score catches degenerate loops") {
    val sparkS = spark
    import sparkS.implicits._
    val docs = Seq(
      (1L, Array.fill(20)("buy now limited offer").mkString(" ")), // loop
      (2L, (1 to 80).map(i => s"unique$i").mkString(" ")))         // no repeats
      .toDF("doc_id", "text")
    val r = TextAnalysis.repetitionScore(docs).collect()
    assert(r(0).getDouble(2) > 0.9)
    assert(r(1).getDouble(2) == 0.0)
  }

  test("rolling-hash fingerprint matches an independent Rabin-Karp implementation") {
    import graft.ops.TextAnalysis.{RkK, RkP, rkPowers}
    def hashes(text: String): Seq[Long] = {
      val cs = text.toCharArray
      val npos = math.max(cs.length - (RkK - 1), 1)
      (0 until npos).map { i =>
        (0 until RkK).map { j =>
          val code = if (i + j < cs.length) cs(i + j).toLong else 0L
          code * rkPowers(j)
        }.sum % RkP
      }
    }
    def expected(text: String): (Long, Seq[Option[Long]]) = {
      val hs = hashes(text)
      val qlen = math.max(math.ceil(hs.length / 4.0).toLong, 1L).toInt
      val qs = (0 until 4).map { m =>
        val s = hs.slice(m * qlen, (m + 1) * qlen)
        if (s.isEmpty) None else Some(s.min)
      }
      (hs.min, qs)
    }
    val texts = Seq(
      "the quick brown fox jumps over the lazy dog",
      "naïve café résumé — unicode codepoints must agree across engines",
      "short") // shorter than one full window
    val sparkS = spark
    import sparkS.implicits._
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val rows = graft.ops.TextAnalysis.rollingFingerprint(df).collect()
    rows.foreach { r =>
      val (wantMin, wantQs) = expected(texts(r.getLong(0).toInt))
      assert(r.getLong(1) == wantMin, s"rk_min for doc ${r.getLong(0)}")
      (0 until 4).foreach { m =>
        val got = if (r.isNullAt(2 + m)) None else Some(r.getLong(2 + m))
        assert(got == wantQs(m), s"q$m for doc ${r.getLong(0)}")
      }
    }
    // alignment robustness: a shifted copy's global min can only pick up
    // new prefix windows — every original window hash is still present
    val shifted = "PREFIX " + texts.head
    assert(hashes(shifted).toSet.intersect(hashes(texts.head).toSet) == hashes(texts.head).toSet)
  }

  test("hash sampling selects exactly the ids the md5 rule admits") {
    // replicate the selection rule independently: first 8 hex chars of
    // md5(id.toString) as a long, keep when divisible by rate
    def expectedIds(ids: Seq[Long], rate: Int): Set[Long] = ids.filter { id =>
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(id.toString.getBytes("UTF-8"))
      val hex = md.take(4).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex, 16) % rate == 0
    }.toSet
    for (rate <- Seq(2, 3, 10)) {
      val got = TextAnalysis.hashSample(docs, rate).collect().map(_.getLong(0)).toSet
      assert(got == expectedIds(Seq(1L, 2L, 3L, 4L, 5L), rate), s"rate=$rate")
    }
    // and it is stable across invocations
    val a = TextAnalysis.hashSample(docs, rate = 2).collect().map(_.getLong(0))
    val b = TextAnalysis.hashSample(docs, rate = 2).collect().map(_.getLong(0))
    assert(a.sameElements(b))
  }

  test("substring dedup finds a passage pasted into two documents") {
    val sparkS = spark
    import sparkS.implicits._
    // a 10-token passage shared verbatim by docs 1 and 2, surrounded by
    // document-unique context; doc 3 shares nothing; doc 4 is shorter
    // than one gram window (k=6)
    val passage = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val planted = Seq(
      (1L, s"one two three four five $passage red blue", "en", "web", 0L),
      (2L, s"six seven eight nine ten eleven $passage green", "en", "wiki", 0L),
      (3L, "totally unrelated words about storms at sea tonight again", "en", "web", 0L),
      (4L, "tiny doc here", "en", "web", 0L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val r = Dedup.substringDedup(planted, k = 6).collect()
      .map(x => x.getLong(0) -> ((x.getLong(1), x.getLong(2), x.getLong(3), x.getDouble(4))))
      .toMap
    // the 10-token passage yields 5 duplicated 6-gram positions per doc;
    // their overlapping windows union to exactly the 10 passage tokens
    // (interval coverage 6 + 4·1) — boundary grams mix in unique context
    // tokens and must NOT be flagged
    assert(r(1L) == ((17L, 5L, 10L, math.rint(10.0 / 17 * 10000) / 10000)))
    assert(r(2L) == ((17L, 5L, 10L, math.rint(10.0 / 17 * 10000) / 10000)))
    assert(r(3L) == ((9L, 0L, 0L, 0.0)))
    assert(r(4L) == ((3L, 0L, 0L, 0.0)))
  }

  test("substring dedup coverage merges overlapping and disjoint spans") {
    val sparkS = spark
    import sparkS.implicits._
    // docs 1 and 2 share TWO disjoint 6-token passages with unique filler
    // between them: 2 dup positions per passage is wrong (each passage is
    // exactly one gram), and the two single-gram spans must not merge
    val p1 = "p q r s t u"
    val p2 = "v w x y z zz"
    val planted = Seq(
      (1L, s"a1 b1 $p1 c1 d1 e1 $p2 f1", "en", "web", 0L),
      (2L, s"a2 $p1 b2 c2 d2 e2 f2 $p2 g2 h2", "en", "web", 0L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val r = Dedup.substringDedup(planted, k = 6).collect()
      .map(x => x.getLong(0) -> ((x.getLong(2), x.getLong(3)))).toMap
    // per doc: 2 duplicated gram positions, 12 covered tokens (6 + 6,
    // spans separated by > k so no overlap credit)
    assert(r(1L) == ((2L, 12L)))
    assert(r(2L) == ((2L, 12L)))

    // the removal intervals segment identically: two 6-token spans per
    // doc, and Σ span_tokens per doc equals dup_tokens exactly
    val spans = Dedup.substringDedupSpans(planted, k = 6).collect()
      .map(x => (x.getLong(0), x.getLong(1), x.getLong(2), x.getLong(3), x.getLong(4)))
    assert(spans.count(_._1 == 1L) == 2 && spans.count(_._1 == 2L) == 2, s"${spans.toSeq}")
    assert(spans.filter(_._1 == 1L).map(_._5).sum == 12L)
    assert(spans.filter(_._1 == 2L).map(_._5).sum == 12L)
    // doc 1: "a1 b1 [p1=3..8] c1 d1 e1 [p2=12..17] f1" — exact intervals
    assert(spans.filter(_._1 == 1L).map(s => (s._3, s._4)).toSet == Set((3L, 8L), (12L, 17L)),
      s"${spans.toSeq}")
  }

  test("substring apply cuts exactly the span tokens and keeps the rest in order") {
    val sparkS = spark
    import sparkS.implicits._
    val p1 = "p q r s t u"
    val p2 = "v w x y z zz"
    val planted = Seq(
      (1L, s"a1 b1 $p1 c1 d1 e1 $p2 f1", "en", "web", 0L),
      (2L, s"a2 $p1 b2 c2 d2 e2 f2 $p2 g2 h2", "en", "web", 0L),
      (3L, "no shared passages anywhere in this one", "en", "web", 0L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val out = Dedup.substringDedupApply(planted, k = 6).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4))))
      .toMap
    // doc 1: both 6-token spans cut, survivors keep original order
    assert(out(1L) == ((18L, 6L, 12L, "a1 b1 c1 d1 e1 f1")))
    assert(out(2L) == ((20L, 8L, 12L, "a2 b2 c2 d2 e2 f2 g2 h2")))
    // doc 3 untouched: zero removed, text round-trips (lowercased tokens)
    assert(out(3L) == ((7L, 7L, 0L, "no shared passages anywhere in this one")))
    // invariant vs the stats operator: removed_tokens == dup_tokens per doc
    val dup = Dedup.substringDedup(planted, k = 6).collect()
      .map(r => r.getLong(0) -> r.getLong(3)).toMap
    out.foreach { case (id, (_, _, removed, _)) => assert(removed == dup(id), s"doc $id") }
  }

  test("set-similarity join matches naive all-pairs on random corpora (completeness)") {
    val sparkS = spark
    import sparkS.implicits._
    // seeded pseudo-random docs over a small vocabulary — dense enough
    // that qualifying pairs exist, adversarial for a buggy prefix length
    val rnd = new scala.util.Random(42)
    val vocab = Vector("aa", "bb", "cc", "dd", "ee", "ff", "gg", "hh")
    val base = Vector.fill(12)(Vector.fill(8 + rnd.nextInt(6))(vocab(rnd.nextInt(vocab.size))))
    // append near-duplicates of a few docs (one token appended/changed)
    val docs = (base ++ base.take(4).map(_ :+ "zz")).zipWithIndex
      .map { case (toks, i) => (i.toLong, toks.mkString(" ")) }
    val df = docs.toDF("doc_id", "text")
      .selectExpr("doc_id", "text", "'en' AS lang", "'web' AS source", "0L AS n_chars")
    val t = 0.6
    def shingles(s: Vector[String]): Set[String] =
      s.sliding(3).filter(_.size == 3).map(_.mkString(" ")).toSet
    val sets = docs.map { case (id, text) => id -> shingles(text.split(" ").toVector) }.toMap
    val expected = (for {
      a <- docs.map(_._1); b <- docs.map(_._1) if a < b
      sa = sets(a); sb = sets(b)
      if sa.nonEmpty && sb.nonEmpty
      j = sa.intersect(sb).size.toDouble / sa.union(sb).size
      if j >= t
    } yield (a, b)).toSet
    val got = Dedup.setSimilarityJoin(df, t).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == expected, s"prefix filter missed or invented pairs:\ngot $got\nexp $expected")
    assert(expected.nonEmpty, "test corpus must contain qualifying pairs")
  }

  test("fuzzy contamination flags one-token-substituted benchmark grams") {
    val sparkS = spark
    import sparkS.implicits._
    // benchmark doc holds one 5-token passage. Corpus doc 2 copies it
    // verbatim (exact ⊆ fuzzy); doc 3 substitutes ONE middle token (fuzzy
    // only); doc 4 substitutes TWO tokens (beyond tolerance — no row).
    val planted = Seq(
      (1L, "alpha beta gamma delta epsilon", "bench", "src0", 0L),
      (2L, "x1 y1 alpha beta gamma delta epsilon z1", "en", "web", 0L),
      (3L, "x2 alpha beta CHANGED delta epsilon y2", "en", "web", 0L),
      (4L, "alpha beta CHANGED delta WRONG", "en", "web", 0L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val r = TextAnalysis.fuzzyContamination(planted).collect()
      .map(x => x.getLong(0) ->
        ((x.getLong(x.fieldIndex("fuzzy_grams")), x.getLong(x.fieldIndex("exact_grams")))))
      .toMap
    assert(r(2L) == ((1L, 1L)), s"verbatim copy must be exact+fuzzy: $r")
    assert(r(3L) == ((1L, 0L)), s"one substitution must be fuzzy, not exact: $r")
    assert(!r.contains(4L), s"two substitutions exceed distance 1: $r")
  }

  test("curation pipeline composes dedup, decontamination, and the quality floor") {
    // docs 1/3 are exact dups across sources (13+ shared words ⇒ also
    // 13-gram contaminated); doc 2 is clean; doc 5 fails the length floor
    val out = TextAnalysis.curationPipeline(docs, minQuality = 0.3).collect()
    val ids = out.map(_.getLong(0)).toSet
    // the dup pair 1/3 and the near-copy 4 share a cross-source 13-gram ⇒
    // all contaminated out; 5 is below the 50-char quality floor (score 0)
    assert(ids == Set(2L), s"expected only the clean doc to survive: $ids")
    // survivors carry their keep-best quality, above the floor
    assert(out.forall(_.getDouble(3) >= 0.3))
    // composition subset-invariants vs the standalone stages
    val bestIds = TextAnalysis.dedupKeepBest(docs).collect().map(_.getLong(1)).toSet
    val flagged = TextAnalysis.ngramContamination(docs).collect().map(_.getLong(0)).toSet
    assert(ids.subsetOf(bestIds) && ids.intersect(flagged).isEmpty)
  }
}
