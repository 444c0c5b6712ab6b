package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Diagnostic main: proves the connected-components fixpoints hold up on
  * long-diameter graphs far beyond what the sf tables exercise — the
  * regime where round 5's planning-stats compounding used to stall the
  * driver and where label contraction's O(diameter) worst case bites.
  * Generates graphs with `spark.range` (no input files):
  *
  *   - `chain`: a single n-vertex path with the min at one end — worst
  *     case for label contraction (one quotient hop per round), the shape
  *     the stars variant is built for;
  *   - `mix`: the same chain plus one pseudo-random long-range edge per 64
  *     vertices (xxhash64-derived, deterministic) — shortcuts collapse
  *     most of the diameter, the LSH-candidate-like regime where plain
  *     contraction shines.
  *
  * For each (graph, variant) it reports rounds taken and wall seconds, and
  * checks labels: on the chain every vertex must land on component min 0;
  * on the mix both variants must agree row-for-row.
  *
  * Usage: `runMain graft.tools.CcScale [nVertices]` (default 100000)
  */
object CcScale {
  def main(args: Array[String]): Unit = {
    val n = if (args.length > 0) args(0).toLong else 100000L
    val spark = SparkSession.builder()
      .appName("graft-cc-scale")
      .master(sys.env.getOrElse("SPARK_MASTER", "local[32]"))
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val verts = spark.range(n).select(col("id").as("doc_id"))
    val chain = spark.range(n - 1)
      .select(col("id").as("doc_a"), (col("id") + 1).as("doc_b"))
    // deterministic long-range shortcuts: vertex 64k gains an edge to
    // xxhash64(64k) mod n — enough expansion to collapse most of the
    // diameter without changing the single-component answer
    val shortcuts = spark.range(n / 64)
      .select(
        (col("id") * 64).as("doc_a"),
        pmod(xxhash64(col("id")), lit(n)).as("doc_b"))
      .filter(col("doc_a") =!= col("doc_b"))
    val graphs = Seq("chain" -> chain, "mix" -> chain.union(shortcuts))

    def run(name: String, cc: (DataFrame, DataFrame, Int) => DataFrame,
            pairs: DataFrame, key: String): DataFrame = {
      val t0 = System.nanoTime()
      val out = cc(pairs, verts, 50)
      val cnt = out.count()
      val wall = (System.nanoTime() - t0) / 1e9
      val rounds = graft.ops.Dedup.lastRounds.getOrDefault(key, -1)
      println(f"$name%-24s vertices=$cnt rounds=$rounds wall=$wall%.1f s")
      out
    }

    for ((gname, pairs) <- graphs) {
      val contraction = run(s"$gname/contraction",
        graft.ops.Dedup.connectedComponents(_, _, _), pairs, "cc_contraction")
      val stars = run(s"$gname/stars",
        graft.ops.Dedup.connectedComponentsStars(_, _, _), pairs, "cc_stars")
      val disagree = contraction.select("doc_id", "cluster_id")
        .except(stars.select("doc_id", "cluster_id")).count()
      val offMin = stars.filter(col("cluster_id") =!= 0L).count()
      println(s"$gname: variants disagree on $disagree rows; " +
        s"$offMin labels off component-min 0")
      require(disagree == 0 && offMin == 0, s"$gname: WRONG LABELS")
    }
    spark.stop()
  }
}
