package graft

import graft.functions.MemberBloom
import graft.sources.MemberProbes
import org.apache.spark.unsafe.types.UTF8String
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Property checks for the membership-bloom planning algebra — the
  * pieces whose soundness every file/commit/chunk drop rests on:
  *
  *  - NO FALSE NEGATIVES, ever: an element folded into a bloom is
  *    always mightContain — for random element sets, random bloom
  *    sizes, both string and long hashing;
  *  - OR-UNION soundness: the union of any group of blooms contains
  *    everything any member contains (the `b~` rollup-cell rule — a
  *    chunk cell that excluded a present key would wrongly drop the
  *    whole chunk);
  *  - the probe WIRE FORMAT round-trips exactly, including
  *    multi-hash disjunctive groups and adversarial column names
  *    (unicode, separators ':' ';' '|', base64-sensitive bytes).
  *
  * Raw ScalaCheck generators with fixed seeds (the scalatestplus
  * bridge is not in the offline cache), pure JVM — no Spark session.
  */
class MemberBloomPropertySpec extends AnyFunSuite {

  private def samples[A](gen: Gen[A], n: Int): Seq[A] =
    (0 until n).flatMap(i => gen.apply(Gen.Parameters.default, Seed(909L + i)))

  private val bitsGen = Gen.oneOf(64, 128, 1024, 8192)

  test("no false negatives: every folded element is mightContain") {
    val caseGen = for {
      bits <- bitsGen
      n <- Gen.chooseNum(0, 400)
      elems <- Gen.listOfN(n, Gen.alphaNumStr.map(_.take(24)))
      longs <- Gen.listOfN(n, Gen.chooseNum(Long.MinValue, Long.MaxValue))
    } yield (bits, elems, longs)
    samples(caseGen, 30).foreach { case (bits, elems, longs) =>
      val b = new Array[Byte](bits / 8)
      val hs = elems.map(s => MemberBloom.hashUtf8(UTF8String.fromString(s))) ++
        longs.map(MemberBloom.hashLong)
      hs.foreach(MemberBloom.set(b, _))
      hs.foreach(h => assert(MemberBloom.mightContain(b, h),
        s"false negative at bits=$bits n=${hs.size}"))
    }
  }

  test("OR-union contains everything any member bloom contains") {
    val caseGen = for {
      bits <- bitsGen
      groups <- Gen.chooseNum(1, 8)
      perGroup <- Gen.listOfN(groups, Gen.chooseNum(0, 120))
    } yield (bits, perGroup)
    samples(caseGen, 25).foreach { case (bits, perGroup) =>
      val rnd = new scala.util.Random(bits * 31 + perGroup.sum)
      val members = perGroup.map { n =>
        val b = new Array[Byte](bits / 8)
        val hs = Seq.fill(n)(rnd.nextLong())
        hs.foreach(MemberBloom.set(b, _))
        (b, hs)
      }
      val union = new Array[Byte](bits / 8)
      members.foreach { case (b, _) =>
        var i = 0
        while (i < union.length) { union(i) = (union(i) | b(i)).toByte; i += 1 }
      }
      members.flatMap(_._2).foreach(h =>
        assert(MemberBloom.mightContain(union, h),
          s"union lost a member element at bits=$bits"))
    }
  }

  test("probe wire format round-trips, including disjunctive groups and hostile names") {
    val nameGen = Gen.oneOf(
      Gen.alphaNumStr.map(s => if (s.isEmpty) "c" else s.take(20)),
      Gen.const("meta.tags"), Gen.const("a:b;c|d"), Gen.const("真实列名"),
      Gen.const("x=y..z"), Gen.const("s~trap"), Gen.const("b~trap"))
    val probeGen = for {
      n <- Gen.chooseNum(0, 6)
      probes <- Gen.listOfN(n, for {
        c <- nameGen
        k <- Gen.chooseNum(1, 5)
        hs <- Gen.listOfN(k, Gen.chooseNum(Long.MinValue, Long.MaxValue))
      } yield (c, hs))
    } yield probes
    samples(probeGen, 40).foreach { probes0 =>
      val probes = probes0.map { case (c, hs) => (c, hs: Seq[Long]) }
      val parsed = MemberProbes.parse(MemberProbes.encode(probes))
      assert(parsed == probes,
        s"round-trip mismatch: $probes -> $parsed")
    }
    // garbage never throws, only drops
    assert(MemberProbes.parse(null) == Nil)
    assert(MemberProbes.parse("") == Nil)
    assert(MemberProbes.parse("not-base64:zz;:|;x") == Nil)
  }
}
