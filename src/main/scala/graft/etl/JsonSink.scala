package graft.etl

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import com.fasterxml.jackson.databind.node.ArrayNode
import org.apache.spark.sql.DataFrame

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

/** Output sinks.
  *
  * [[writeSingleJsonArray]] reproduces the reference's correctness contract
  * (reference: etl_pipeline.py:376-380): ONE pretty-printed JSON array file,
  * null fields omitted (Spark `toJSON` drops nulls, so e.g. the 406 cleaned
  * records with an unparseable timestamp have no `timestamp_utc` key, and
  * `raw_data` omits null members). This is deliberately driver-side — the
  * same choice the reference makes — and therefore guarded by `maxRows`.
  *
  * [[writeJsonLines]] is the 100 TB-scale path: fully distributed JSON-lines
  * parquet-style part files, same null-dropping record shape, no driver
  * collect. Callers at scale use this; the array sink exists for golden
  * format parity on small reconciliation outputs.
  */
object JsonSink {

  val DefaultMaxRows: Long = 5000000L

  /** Collect `df` to the driver as one pretty JSON array (2-space indent).
    * Rows arrive already serialized/null-dropped by Spark's JSON encoder;
    * Jackson re-parses and pretty-prints. Returns the record count.
    *
    * @throws IllegalArgumentException if the row count exceeds `maxRows`
    *         (use [[writeJsonLines]] instead at scale).
    */
  def writeSingleJsonArray(df: DataFrame, path: String, maxRows: Long = DefaultMaxRows): Long = {
    // stream partition-at-a-time so the guard trips BEFORE the driver
    // holds more than maxRows rows (a post-collect check would OOM first)
    val buf = scala.collection.mutable.ArrayBuffer.empty[String]
    val it = df.toJSON.toLocalIterator()
    while (it.hasNext) {
      require(
        buf.length < maxRows,
        s"writeSingleJsonArray: more than maxRows=$maxRows rows; use writeJsonLines for large outputs")
      buf += it.next()
    }
    val rows: Seq[String] = buf.toSeq
    val mapper = new ObjectMapper()
    val arr: ArrayNode = mapper.createArrayNode()
    rows.foreach { r => arr.add(mapper.readTree(r): JsonNode) }
    val writer = mapper.writerWithDefaultPrettyPrinter()
    Files.write(Paths.get(path), writer.writeValueAsBytes(arr))
    rows.length.toLong
  }

  /** Distributed JSON-lines sink: one record per line across part files.
    * Spark's JSON writer drops null fields, matching the array sink's
    * record shape. `ignoreNullFields` is the default but set explicitly —
    * it is the correctness contract, not a preference.
    */
  def writeJsonLines(df: DataFrame, dir: String): Unit =
    df.write.mode("overwrite").option("ignoreNullFields", "true").json(dir)

  /** Read back a single-file JSON array written by [[writeSingleJsonArray]]
    * (or the reference's golden files) for comparison in tests.
    */
  def readJsonArray(path: String): ArrayNode = {
    val mapper = new ObjectMapper()
    val bytes = Files.readAllBytes(Paths.get(path))
    mapper.readTree(new String(bytes, StandardCharsets.UTF_8)).asInstanceOf[ArrayNode]
  }
}
