package graft

/** Reader-memory probe for merge-on-read tombstone keys: builds the same
  * doomed-key set two ways — the old boxed `java.util.HashSet[Any]` and
  * the primitive-specialized sorted `long[]` the readers now use — at the
  * delete-size gate's ceiling (`VersionedTable.MorMaxDeleteKeys`, 10M
  * keys), and reports retained heap plus membership-probe throughput for
  * each. No Spark session: this measures exactly the per-reader-task
  * structure, which is what multiplies by task count at 100 TB.
  *
  * Usage: `sbt "runMain graft.TombstoneMemProbe [nKeys] [nProbes]"`.
  */
object TombstoneMemProbe {
  private val rt = Runtime.getRuntime

  private def settledUsed(): Long = {
    var prev = Long.MaxValue
    var cur = rt.totalMemory - rt.freeMemory
    var i = 0
    while (i < 8 && cur < prev) {
      System.gc()
      Thread.sleep(100)
      prev = cur
      cur = rt.totalMemory - rt.freeMemory
      i += 1
    }
    cur
  }

  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(10 * 1000 * 1000)
    val probes = args.lift(1).map(_.toInt).getOrElse(10 * 1000 * 1000)
    def key(i: Int): Long = i.toLong * 7L + 3L

    // --- boxed HashSet (the pre-round-14 representation) ---
    val base0 = settledUsed()
    var boxed = new java.util.HashSet[Any]()
    var i = 0
    while (i < n) { boxed.add(java.lang.Long.valueOf(key(i))); i += 1 }
    val boxedBytes = settledUsed() - base0
    var hits = 0L
    val t0 = System.nanoTime()
    i = 0
    while (i < probes) {
      if (boxed.contains(java.lang.Long.valueOf(i.toLong * 11L))) hits += 1
      i += 1
    }
    val boxedProbeSec = (System.nanoTime() - t0) / 1e9
    boxed = null

    // --- primitive sorted long[] (the round-14 representation) ---
    val base1 = settledUsed()
    var prim = new Array[Long](n)
    i = 0
    while (i < n) { prim(i) = key(i); i += 1 }
    java.util.Arrays.sort(prim)
    val primBytes = settledUsed() - base1
    var hits2 = 0L
    val t1 = System.nanoTime()
    i = 0
    while (i < probes) {
      if (java.util.Arrays.binarySearch(prim, i.toLong * 11L) >= 0) hits2 += 1
      i += 1
    }
    val primProbeSec = (System.nanoTime() - t1) / 1e9
    prim = null

    println(
      f"""{"probe":"tombstone_mem","n_keys":$n,"n_probes":$probes,""" +
        f""""boxed_hashset_mb":${boxedBytes / 1048576.0}%.1f,""" +
        f""""sorted_longs_mb":${primBytes / 1048576.0}%.1f,""" +
        f""""mem_ratio":${boxedBytes.toDouble / math.max(primBytes, 1L)}%.1f,""" +
        f""""boxed_probe_sec":$boxedProbeSec%.3f,""" +
        f""""prim_probe_sec":$primProbeSec%.3f,""" +
        f""""hits_equal":${hits == hits2}}""")
  }
}
