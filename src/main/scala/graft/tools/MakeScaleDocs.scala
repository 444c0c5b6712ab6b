package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Diagnostic main: builds an sf0.5-scale `documents` + `embeddings` pair
  * by replicating the sf0.1 tables `factor`× with deterministic
  * perturbations, for the scale-stress run (`PlanAudit` over the dedup /
  * ANN suite at 5× the per-round gate's data). Replica 0 is the original
  * row; replicas k>0 get disjoint id ranges, a short text suffix (keeps
  * them NEAR-duplicates of the original — the LSH/minhash pipelines see a
  * realistic 5×-denser candidate graph rather than pure exact copies), and
  * an embedding nudged by k·1e-3 per component (same IVF cell, nonzero
  * distance). Output goes under target/ — the driver's testdata stays
  * read-only.
  *
  * Usage: `runMain graft.tools.MakeScaleDocs [srcDir] [outDir] [factor]`
  */
object MakeScaleDocs {
  def main(args: Array[String]): Unit = {
    val src = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val out = if (args.length > 1) args(1) else "target/sf0.5"
    val factor = if (args.length > 2) args(2).toInt else 5
    val spark = SparkSession.builder()
      .appName("graft-make-scale-docs")
      .master(sys.env.getOrElse("SPARK_MASTER", "local[32]"))
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val reps = explode(sequence(lit(0), lit(factor - 1))).as("rep")

    // replica id offset derived from the actual max source id — a fixed
    // 1M stride would silently collide replicas on a bigger source table
    val srcDocs = spark.read.parquet(s"$src/documents.parquet")
    val srcEmbs = spark.read.parquet(s"$src/embeddings.parquet")
    val docStride = srcDocs.agg(max("doc_id")).head().getLong(0) + 1L
    val embStride = srcEmbs.agg(max("vec_id")).head().getLong(0) + 1L

    val docs = srcDocs
      .select(col("*"), reps)
      .select(
        (col("doc_id") + col("rep") * lit(docStride)).as("doc_id"),
        when(col("rep") === 0, col("text"))
          .otherwise(concat(col("text"), lit(" v"), col("rep"))).as("text"),
        col("lang"), col("source"))
      // n_chars from the text actually built — the fixed "+3" form was
      // only correct for single-digit replica suffixes
      .withColumn("n_chars", length(col("text")).cast("long"))
    docs.repartition(8).write.mode("overwrite").parquet(s"$out/documents.parquet")

    val embs = srcEmbs
      .select(col("*"), reps)
      .select(
        (col("vec_id") + col("rep") * lit(embStride)).as("vec_id"),
        transform(col("embedding"),
          x => x + col("rep").cast("float") * lit(0.001f)).as("embedding"),
        col("label"))
    embs.repartition(8).write.mode("overwrite").parquet(s"$out/embeddings.parquet")

    println(s"wrote ${docs.count()} documents, ${embs.count()} embeddings to $out")
    spark.stop()
  }
}
