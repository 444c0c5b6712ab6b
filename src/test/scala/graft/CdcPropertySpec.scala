package graft

import graft.ops.Incremental
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Property check of both CDC apply forms against an independent
  * in-memory fold model on random bases and change logs: apply the
  * changes in ascending sequence order to a key→row map (U/I upsert,
  * D remove), and the distributed result — merge form AND broadcast
  * form — must equal the model exactly. Random logs exercise what the
  * unit cases can't enumerate: repeated updates to one key, delete→
  * re-insert chains, updates to absent keys, interleaved seq orders.
  *
  * Uses raw ScalaCheck generators with a fixed seed (the scalatestplus
  * bridge is not in the offline artifact cache); small sample counts —
  * every case runs two full Spark plans.
  */
class CdcPropertySpec extends AnyFunSuite {

  private lazy val spark = SparkTestBase.spark

  private def samples[A](gen: Gen[A], n: Int): Seq[A] =
    (0 until n).flatMap(i => gen.apply(Gen.Parameters.default, Seed(4242L + i)))

  private val caseGen = for {
    nBase <- Gen.chooseNum(0, 8)
    baseKeys <- Gen.pick(nBase, 0L until 12L)
    nCh <- Gen.chooseNum(0, 20)
    ops <- Gen.listOfN(nCh, for {
      k <- Gen.chooseNum(0L, 11L)
      op <- Gen.oneOf("U", "I", "D")
      v <- Gen.chooseNum(0L, 999L)
    } yield (k, op, v))
  } yield (baseKeys.toSeq.sorted, ops)

  /** The model: fold changes by ascending seq into a key→value map. */
  private def model(
      base: Seq[Long], ops: Seq[(Long, String, Long, Long)]): Map[Long, Long] =
    ops.sortBy(_._4).foldLeft(base.map(k => k -> k * 10L).toMap) {
      case (m, (k, "D", _, _)) => m - k
      case (m, (k, _, v, _))   => m.updated(k, v) // U and I both upsert
    }

  test("both apply forms equal the sequential fold model on random logs") {
    val sparkS = spark
    import sparkS.implicits._
    samples(caseGen, 12).zipWithIndex.foreach { case ((baseKeys, rawOps), i) =>
      // unique ascending seqs; shuffle-resistant because seq is explicit
      val ops = rawOps.zipWithIndex.map { case ((k, op, v), s) => (k, op, v, s.toLong) }
      val expected = model(baseKeys, ops)
      val base = baseKeys.map(k => (k, k * 10L)).toDF("k", "v")
      val changes = ops.map { case (k, op, v, s) =>
        (k, op, s, if (op == "D") null else java.lang.Long.valueOf(v))
      }.toDF("k", "op", "seq", "v")
      for ((form, name) <- Seq(
          (Incremental.cdcApply(base, changes, "k"), "merge"),
          (Incremental.cdcApplyBroadcast(base, changes, "k"), "broadcast"))) {
        val got = form.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
        assert(got == expected,
          s"case $i ($name): base=$baseKeys ops=$ops\n got $got\n expected $expected")
      }
    }
  }
}
