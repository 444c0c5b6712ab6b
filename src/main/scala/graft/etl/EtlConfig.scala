package graft.etl

/** Configuration model for the trade-reconciliation pipeline.
  *
  * Mirrors the reference's YAML config surface (reference: config.yaml:1-16,
  * loaded at etl_pipeline.py:30-31): validation thresholds, data-quality
  * toggles, and output paths. The build is offline (no YAML dependency
  * resolvable), so [[EtlConfig.fromYaml]] is a minimal hand-rolled parser for
  * the two-level `section:\n  key: value` subset the reference uses.
  */
final case class ValidationConfig(
    priceDiscrepancyThresholdExclusive: Double,
    priceDecimalPlaces: Int,
)

final case class DataQualityConfig(
    filterCancelledTrades: Boolean,
    filterDuplicates: Boolean,
    /** Parsed for config-surface parity but intentionally unused: the
      * reference declares this key (config.yaml) and never reads it —
      * timestamp normalization always runs (etl_pipeline.py:288-342, and
      * no `normalize_timestamps` lookup anywhere in the file).
      */
    normalizeTimestamps: Boolean,
)

final case class OutputConfig(
    cleanedTradesPath: String,
    exceptionsReportPath: String,
)

final case class EtlConfig(
    validation: ValidationConfig,
    dataQuality: DataQualityConfig,
    output: OutputConfig,
)

object EtlConfig {

  /** Defaults identical to the reference's committed config.yaml. */
  val default: EtlConfig = EtlConfig(
    validation = ValidationConfig(
      priceDiscrepancyThresholdExclusive = 0.01,
      priceDecimalPlaces = 2,
    ),
    dataQuality = DataQualityConfig(
      filterCancelledTrades = true,
      filterDuplicates = true,
      normalizeTimestamps = true,
    ),
    output = OutputConfig(
      cleanedTradesPath = "cleaned_trades.json",
      exceptionsReportPath = "exceptions_report.json",
    ),
  )

  /** Parse the two-level YAML subset used by the reference config.
    * Unknown keys are ignored; missing keys fall back to [[default]].
    */
  def fromYaml(text: String): EtlConfig = {
    var section = ""
    val values = scala.collection.mutable.Map.empty[(String, String), String]
    for (rawLine <- text.linesIterator) {
      val noComment = {
        // strip comments only outside quotes; config values here never
        // contain '#' inside quotes, so a simple split is sufficient
        val i = rawLine.indexOf('#')
        if (i >= 0 && !rawLine.take(i).count(_ == '"').%(2).equals(1)) rawLine.take(i)
        else rawLine
      }
      val line = noComment.replaceAll("\\s+$", "")
      if (line.nonEmpty) {
        val indented = line.startsWith(" ") || line.startsWith("\t")
        val trimmed = line.trim
        trimmed.split(":", 2) match {
          case Array(k, v) if v.trim.isEmpty && !indented => section = k.trim
          case Array(k, v) if indented =>
            values((section, k.trim)) = unquote(v.trim)
          case _ => ()
        }
      }
    }
    def str(s: String, k: String, dflt: String): String = values.getOrElse((s, k), dflt)
    def dbl(s: String, k: String, dflt: Double): Double =
      values.get((s, k)).map(_.toDouble).getOrElse(dflt)
    def int(s: String, k: String, dflt: Int): Int =
      values.get((s, k)).map(_.toInt).getOrElse(dflt)
    def bool(s: String, k: String, dflt: Boolean): Boolean =
      values.get((s, k)).map(_.equalsIgnoreCase("true")).getOrElse(dflt)

    val d = default
    EtlConfig(
      validation = ValidationConfig(
        priceDiscrepancyThresholdExclusive =
          dbl("validation", "price_discrepancy_threshold_exclusive", d.validation.priceDiscrepancyThresholdExclusive),
        priceDecimalPlaces = int("validation", "price_decimal_places", d.validation.priceDecimalPlaces),
      ),
      dataQuality = DataQualityConfig(
        filterCancelledTrades = bool("data_quality", "filter_cancelled_trades", d.dataQuality.filterCancelledTrades),
        filterDuplicates = bool("data_quality", "filter_duplicates", d.dataQuality.filterDuplicates),
        normalizeTimestamps = bool("data_quality", "normalize_timestamps", d.dataQuality.normalizeTimestamps),
      ),
      output = OutputConfig(
        cleanedTradesPath = str("output", "cleaned_trades_path", d.output.cleanedTradesPath),
        exceptionsReportPath = str("output", "exceptions_report_path", d.output.exceptionsReportPath),
      ),
    )
  }

  def fromYamlFile(path: String): EtlConfig =
    fromYaml(new String(java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path)), "UTF-8"))

  private def unquote(s: String): String =
    if (s.length >= 2 && s.head == '"' && s.last == '"') s.substring(1, s.length - 1) else s
}
