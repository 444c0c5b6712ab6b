package graft.sources

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Property pins for the string zone-map truncation arithmetic. The
  * pruning contract is: for EVERY value v in a file, the recorded bounds
  * satisfy truncMin(min) ≤ v and v < / ≤ the truncMax bound — validity,
  * not exactness, which is all file skipping needs. Random byte strings
  * (including 0xFF runs, multi-byte UTF-8, and shared long prefixes)
  * exercise the increment-and-cut edge cases directly.
  *
  * Raw ScalaCheck generators with fixed seeds (the scalatestplus bridge
  * is not in the offline artifact cache).
  */
class StrZoneSpec extends AnyFunSuite {
  import VersionedTable.{StrZoneLen, byteCompare, incrementPrefix, truncMax, truncMin}

  private def samples[A](gen: Gen[A], n: Int): Seq[A] =
    (0 until n).flatMap(i => gen.apply(Gen.Parameters.default, Seed(4242L + i)))

  private val byteGen: Gen[Byte] = Gen.frequency(
    4 -> Gen.chooseNum(0, 255).map(_.toByte),
    2 -> Gen.const(0xFF.toByte), // exercise the increment carry
    2 -> Gen.chooseNum('a'.toInt, 'z'.toInt).map(_.toByte))
  private val bytesGen: Gen[Array[Byte]] =
    Gen.chooseNum(0, 40).flatMap(n => Gen.listOfN(n, byteGen).map(_.toArray))
  // force collisions around the truncation cut: many strings sharing one
  // of a few long prefixes, diverging only past byte 16
  private val prefixed: Gen[Array[Byte]] = for {
    p <- Gen.oneOf("k000000000000000", "k0000000ÿÿÿÿÿÿÿÿ", "short")
    tail <- bytesGen
  } yield p.getBytes(java.nio.charset.StandardCharsets.ISO_8859_1) ++ tail
  private val valueGen: Gen[Array[Byte]] = Gen.oneOf(bytesGen, prefixed)

  test("byteCompare equals Spark's UTF8String binary comparison") {
    import org.apache.spark.unsafe.types.UTF8String
    val strGen = Gen.listOfN(2, Gen.oneOf(
      Gen.asciiPrintableStr, Gen.alphaNumStr, Gen.const("élan-ÿ✓"),
      Gen.const(""), Gen.const("k000000100" + "x" * 20)))
    samples(strGen, 300).foreach { pair =>
      val (a, b) = (pair.head, pair(1))
      val c = byteCompare(a.getBytes("UTF-8"), b.getBytes("UTF-8"))
      val ref = UTF8String.fromString(a).compareTo(UTF8String.fromString(b))
      assert(math.signum(c.toDouble) == math.signum(ref.toDouble),
        s"byteCompare($a, $b)=$c but UTF8String says $ref")
    }
  }

  test("truncMin is a valid lower bound; truncMax a valid strict-or-equal upper bound") {
    val fileGen = Gen.nonEmptyListOf(valueGen)
    samples(fileGen, 300).foreach { vs =>
      val mn = vs.reduce((a, b) => if (byteCompare(a, b) <= 0) a else b)
      val mx = vs.reduce((a, b) => if (byteCompare(a, b) >= 0) a else b)
      val lo = truncMin(mn)
      assert(lo.length <= StrZoneLen || (lo sameElements mn))
      vs.foreach { v =>
        assert(byteCompare(lo, v) <= 0,
          s"truncMin must lower-bound every value (lo=${lo.toSeq} v=${v.toSeq})")
      }
      truncMax(mx).foreach { hi =>
        vs.foreach { v =>
          assert(byteCompare(v, hi) <= 0,
            s"truncMax must upper-bound every value (hi=${hi.toSeq} v=${v.toSeq})")
        }
      }
    }
  }

  test("incrementPrefix strictly exceeds every extension of the prefix") {
    samples(bytesGen.suchThat(_.nonEmpty), 300).foreach { p =>
      incrementPrefix(p) match {
        case Some(q) =>
          assert(byteCompare(p, q) < 0)
          // any extension of p stays below q
          val ext = p ++ Array(0xFF.toByte, 0xFF.toByte, 0x00.toByte)
          assert(byteCompare(ext, q) < 0,
            s"extension ${ext.toSeq} must stay below ${q.toSeq}")
        case None =>
          assert(p.forall(_ == 0xFF.toByte),
            "only an all-0xFF prefix has no finite upper bound")
      }
    }
  }

  test("all-0xFF past the cut: truncMax carries into an earlier byte or declines") {
    val p = Array.fill(StrZoneLen + 4)(0xFF.toByte)
    assert(truncMax(p).isEmpty, "an all-0xFF value has no truncated upper bound")
    val q = ("ab" + "ÿ" * 20).getBytes(java.nio.charset.StandardCharsets.ISO_8859_1)
    val hi = truncMax(q).getOrElse(fail("carry must reach byte 1"))
    // increment lands on 'b' -> 'c', cut there
    assert(hi sameElements Array('a'.toByte, 'c'.toByte))
    assert(byteCompare(q, hi) < 0)
  }
}
