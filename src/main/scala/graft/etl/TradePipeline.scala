package graft.etl

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col
import org.apache.spark.storage.StorageLevel

/** End-to-end orchestration of the trade-reconciliation pipeline with the
  * reference's metric semantics (reference: etl_pipeline.py:423-442 and the
  * count-subtraction pattern at etl_pipeline.py:105-140, 275-281).
  *
  * Where the reference re-executes the upstream DAG for every `count()`
  * (~6 redundant executions — it never caches), this orchestrator persists
  * the two branch points (post-quality trades, validated trades) so each
  * stage executes once. Metric *values* are identical; only the physical
  * execution count changes. At 100 TB this is the difference between one
  * pass and six.
  */
object TradePipeline {

  final case class Metrics(
      processedTrades: Long,
      duplicateTrades: Long,
      cancelledTrades: Long,
      successfulTrades: Long,
      invalidTrades: Long,
      discrepancyTrades: Long,
  )

  final case class Result(
      cleanedTrades: DataFrame,
      exceptions: DataFrame,
      metrics: Metrics,
      /** Releases the pipeline's persisted intermediates. Call after the
        * returned DataFrames have been written/consumed; until then the
        * validated branch point stays cached so downstream actions do not
        * re-execute the scan→dedup→join→validate chain.
        */
      unpersist: () => Unit,
  )

  /** Run extract → quality → enrich → validate → clean lazily, computing the
    * six reference metrics. Input paths point at the three CSVs.
    */
  def run(
      spark: SparkSession,
      tradesCsv: String,
      fillsCsv: String,
      symbolsCsv: String,
      cfg: EtlConfig = EtlConfig.default,
  ): Result = {
    val trades = TradeEtl.readCsv(spark, tradesCsv)
    val fills = TradeEtl.readCounterpartyFills(spark, fillsCsv)
    val symbols = TradeEtl.readCsv(spark, symbolsCsv)

    // Quality: metrics by count-subtraction (reference: etl_pipeline.py:105-140).
    // Both "identified" metrics are computed UNCONDITIONALLY — the reference
    // always runs the dedup count and the cancelled count
    // (etl_pipeline.py:110-117, 125-132) and gates only which DataFrame
    // flows downstream (etl_pipeline.py:120-123, 135-138).
    val processed = trades.count()
    // persist only when the deduped frame flows downstream — with the
    // toggle off it is consumed by exactly one count and a cache write
    // would be pure overhead
    val deduped =
      if (cfg.dataQuality.filterDuplicates)
        TradeEtl.dedupByTradeId(trades).persist(StorageLevel.MEMORY_AND_DISK)
      else TradeEtl.dedupByTradeId(trades)
    val dedupCount = deduped.count()
    val duplicateCount = processed - dedupCount

    val (afterDedup, baseCount, dedupHandle) =
      if (cfg.dataQuality.filterDuplicates) (deduped, dedupCount, Some(deduped))
      else (trades, processed, None)

    // Cancelled metric measured on the (possibly deduped) flow, as the
    // reference does (its running current_count reflects the dedup gate).
    val withoutCancelled = TradeEtl.filterCancelled(afterDedup)
    val cancelledCount = baseCount - withoutCancelled.count()
    val qualityDf =
      if (cfg.dataQuality.filterCancelledTrades) withoutCancelled else afterDedup

    // Enrich + validate, persisted once for the 3 downstream consumers
    // (valid branch, invalid branch, discrepancy count).
    val validated = TradeEtl
      .validate(
        TradeEtl.enrich(qualityDf, fills, symbols),
        cfg.validation.priceDiscrepancyThresholdExclusive)
      .persist(StorageLevel.MEMORY_AND_DISK)

    val valid = validated.filter(col("is_valid"))
    val invalid = validated.filter(!col("is_valid"))
    val validCount = valid.count()
    val invalidCount = invalid.count()
    val discrepancyCount = valid.filter(col("discrepancy_flag")).count()

    val cleaned = TradeEtl.cleanValid(valid, cfg.validation.priceDecimalPlaces)
    val exceptions = TradeEtl.exceptionsReport(invalid)
    // The counts above fully materialized `validated`'s cache, so the dedup
    // cache upstream of it is no longer load-bearing and can go now; the
    // validated cache itself stays until the caller's unpersist() — the
    // returned DataFrames read from it.
    dedupHandle.foreach(_.unpersist(blocking = false))

    Result(
      cleanedTrades = cleaned,
      exceptions = exceptions,
      metrics = Metrics(
        processedTrades = processed,
        duplicateTrades = duplicateCount,
        cancelledTrades = cancelledCount,
        successfulTrades = validCount,
        invalidTrades = invalidCount,
        discrepancyTrades = discrepancyCount,
      ),
      unpersist = () => validated.unpersist(blocking = false),
    )
  }

  /** CLI entry: `run <inputDir> <outDir> [configYaml]`. Writes the two
    * golden-format outputs (sorted by id for reproducibility — the
    * reference's golden files are sorted, incidentally; we sort on purpose)
    * and prints the metrics.
    */
  def main(args: Array[String]): Unit = {
    val inputDir = if (args.length > 0) args(0) else "/root/reference"
    val outDir = if (args.length > 1) args(1) else "target/etl_out"
    val cfg =
      if (args.length > 2) EtlConfig.fromYamlFile(args(2)) else EtlConfig.default

    val spark = SparkSession.builder()
      .appName("graft-trade-etl")
      .master(sys.env.getOrElse("SPARK_MASTER", "local[32]"))
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    new java.io.File(outDir).mkdirs()
    val result = run(
      spark,
      s"$inputDir/trades.csv",
      s"$inputDir/counterparty_fills.csv",
      s"$inputDir/symbols_reference.csv",
      cfg)

    val nValid = JsonSink.writeSingleJsonArray(
      result.cleanedTrades.orderBy("trade_id"),
      s"$outDir/${cfg.output.cleanedTradesPath}")
    val nInvalid = JsonSink.writeSingleJsonArray(
      result.exceptions.orderBy("record_id"),
      s"$outDir/${cfg.output.exceptionsReportPath}")

    println(s"metrics=${result.metrics} written_valid=$nValid written_invalid=$nInvalid")
    result.unpersist()
    spark.stop()
  }
}
