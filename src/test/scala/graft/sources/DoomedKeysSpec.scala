package graft.sources

import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite

/** Membership pins for the primitive-specialized tombstone key
  * structures: the sorted-long-bits representation must reproduce the
  * equality semantics the old boxed `java.util.HashSet[Any]` gave —
  * including IEEE edge cases (NaN dooms NaN, -0.0 does not doom 0.0) and
  * cross-type immunity (a double's bit pattern never dooms a long key).
  */
class DoomedKeysSpec extends AnyFunSuite {
  import DoomedKeys._

  private def longs(kind: Int, vs: Long*): LongDoomedKeys = {
    val a = vs.toArray
    java.util.Arrays.sort(a)
    new LongDoomedKeys(kind, a)
  }

  test("integral keys: binary-search membership; INT32 and INT64 probes value-match") {
    val k = longs(KindIntegral, 5L, -3L, Long.MaxValue, 0L)
    assert(k.size == 4)
    for (v <- Seq(5L, -3L, Long.MaxValue, 0L)) {
      assert(k.containsBits(v))
      assert(k.contains(java.lang.Long.valueOf(v)))
    }
    assert(!k.containsBits(4L))
    assert(!k.contains(java.lang.Long.valueOf(Long.MinValue)))
    // INT32 and INT64 are ONE family: a type-widened column mixes INT32
    // data files with an INT64 tombstone, and value equality is what a
    // delete means — an Integer probe of the same value matches
    assert(k.contains(Integer.valueOf(5)))
    assert(!k.contains(Integer.valueOf(4)))
  }

  test("double keys: bit-pattern equality — NaN dooms NaN, -0.0 does not doom 0.0") {
    def bits(d: Double) = java.lang.Double.doubleToLongBits(d)
    val k = longs(KindDouble, bits(1.5), bits(Double.NaN), bits(-0.0))
    assert(k.contains(java.lang.Double.valueOf(1.5)))
    // doubleToLongBits canonicalizes NaN: any NaN probe matches
    assert(k.contains(java.lang.Double.valueOf(Double.NaN)))
    assert(k.contains(java.lang.Double.valueOf(
      java.lang.Double.longBitsToDouble(0x7ff8000000000001L))))
    assert(k.contains(java.lang.Double.valueOf(-0.0)))
    assert(!k.contains(java.lang.Double.valueOf(0.0)),
      "-0.0 and 0.0 have distinct bit patterns — boxed Double.equals parity")
    assert(!k.contains(java.lang.Double.valueOf(1.5000001)))
    // a long probe whose value happens to equal a double's bit pattern
    // must not match — kind guards cross-type bit collisions
    assert(!k.contains(java.lang.Long.valueOf(bits(1.5))))
  }

  test("float and boolean keys normalize through their bit families") {
    def fbits(f: Float) = java.lang.Float.floatToIntBits(f).toLong
    val kf = longs(KindFloat, fbits(2.25f), fbits(Float.NaN))
    assert(kf.contains(java.lang.Float.valueOf(2.25f)))
    assert(kf.contains(java.lang.Float.valueOf(Float.NaN)))
    assert(!kf.contains(java.lang.Float.valueOf(2.26f)))
    assert(!kf.contains(java.lang.Double.valueOf(2.25)))
    val kb = longs(KindBool, 1L)
    assert(kb.contains(java.lang.Boolean.TRUE))
    assert(!kb.contains(java.lang.Boolean.FALSE))
  }

  test("string keys: UTF8String set with String-probe normalization") {
    val set = new java.util.HashSet[UTF8String]()
    set.add(UTF8String.fromString("a"))
    set.add(UTF8String.fromString("δoc")) // multibyte survives the round trip
    val k = new StringDoomedKeys(set)
    assert(k.size == 2)
    assert(k.containsUtf8(UTF8String.fromString("a")))
    assert(k.contains("a"))
    assert(k.contains("δoc"))
    assert(k.contains(UTF8String.fromString("δoc")))
    assert(!k.contains("b"))
    assert(!k.contains(java.lang.Long.valueOf(97L)))
  }

  test("TombstoneKeys.load builds the primitive structure from a real tombstone file") {
    val spark = graft.SparkTestBase.spark
    import spark.implicits._
    val dir = graft.SparkTestBase.tempDir("graft_doomed_load")
    Seq(3L, 1L, 2L).toDF("k").coalesce(1).write.parquet(s"$dir/ts")
    val file = java.nio.file.Files.list(java.nio.file.Paths.get(s"$dir/ts"))
      .iterator().next() match {
      case p if p.toString.endsWith(".parquet") => p.toString
      case _ =>
        import scala.jdk.CollectionConverters._
        java.nio.file.Files.list(java.nio.file.Paths.get(s"$dir/ts"))
          .iterator().asScala.map(_.toString).find(_.endsWith(".parquet")).get
    }
    val Seq((name, keys)) = TombstoneKeys.load(Seq(file))
    assert(name == "k")
    val lk = keys.asInstanceOf[LongDoomedKeys]
    assert(lk.kind == KindIntegral && lk.size == 3)
    assert(Seq(1L, 2L, 3L).forall(lk.containsBits))
    assert(!lk.containsBits(0L) && !lk.containsBits(4L))
    // the per-executor cache serves the SAME instance on a re-load —
    // tombstone files are immutable, so tasks share one decoded set
    val Seq((_, again)) = TombstoneKeys.load(Seq(file))
    assert(again eq keys, "second load must hit the executor cache")
  }
}
