package graft.sources

import graft.SparkTestBase
import org.scalatest.funsuite.AnyFunSuite
import scala.jdk.CollectionConverters._

/** Pins for row-group skipping INSIDE planned files: the catalog's
  * vectorized reader, handed the scan's zone-map bounds as a parquet
  * FilterPredicate, must decode only the row groups whose footer stats
  * intersect them — and the skip must be invisible to results (Spark
  * re-applies every filter residually). The fixture forces several
  * small row groups into ONE sorted file via the parquet block-size
  * writer option, so the skip is observable as a row-count drop at the
  * reader itself.
  */
class RowGroupFilterSpec extends AnyFunSuite {

  private lazy val spark = SparkTestBase.spark
  private lazy val root = SparkTestBase.tempDir("rg_root").toString

  // build() now takes per-column effective types (the per-generation
  // form); a single-generation fixture's map is just its schema's
  private def typedOf(schema: org.apache.spark.sql.types.StructType) =
    schema.fields.map(f => f.name -> f.dataType).toMap

  private def oneSortedFile(table: String, n: Long): String = {
    val s = spark; import s.implicits._
    VersionedTable.commit(
      (1L to n).map(k => (k, f"s$k%08d", k * 2.0)).toDF("k", "sk", "d")
        .coalesce(1).sortWithinPartitions("k"),
      table, append = false, statsCols = Seq("k", "sk"),
      // ~64 KB row groups: plenty of groups in one file
      writeOptions = Map("parquet.block.size" -> "65536"))
    val files = java.nio.file.Files
      .walk(java.nio.file.Paths.get(table, "data")).iterator.asScala
      .filter(p => p.toString.endsWith(".parquet") &&
        !p.getFileName.toString.startsWith("."))
      .map(_.toString).toSeq
    assert(files.size == 1, s"expected one data file, got $files")
    files.head
  }

  private def rowGroups(file: String): Int = {
    val rd = org.apache.parquet.hadoop.ParquetFileReader.open(
      org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
        new org.apache.hadoop.fs.Path(file),
        new org.apache.hadoop.conf.Configuration()))
    try rd.getFooter.getBlocks.size finally rd.close()
  }

  private def readAll(file: String,
      schema: org.apache.spark.sql.types.StructType,
      pred: Option[org.apache.parquet.filter2.predicate.FilterPredicate])
      : Seq[Long] = {
    val r = new GraftCatalogVectorReader(file, schema, Nil, pred)
    val out = scala.collection.mutable.ArrayBuffer[Long]()
    try {
      while (r.next()) {
        val b = r.get()
        var i = 0
        while (i < b.numRows()) { out += b.column(0).getLong(i); i += 1 }
      }
    } finally r.close()
    out.toSeq
  }

  test("integral bounds skip row groups; every matching row survives") {
    val t = s"$root/default/rgi"
    val file = oneSortedFile(t, 60000L)
    val groups = rowGroups(file)
    assert(groups >= 4, s"fixture must span several row groups, got $groups")
    val schema = VersionedTable.read(spark, t).schema
    val all = readAll(file, schema, None)
    assert(all.size == 60000)
    val pred = GraftRowGroupFilter.build(
      typedOf(schema), Map("k" -> (59000L, 59500L)), Map.empty)
    assert(pred.nonEmpty)
    val got = readAll(file, schema, pred)
    assert(got.size < all.size,
      s"row groups must be skipped (got ${got.size} of ${all.size})")
    val gotSet = got.toSet
    assert((59000L to 59500L).forall(gotSet.contains),
      "a skipped row group may never hold a matching row")
  }

  test("string bounds skip row groups the same way") {
    val t = s"$root/default/rgs"
    val file = oneSortedFile(t, 60000L)
    val schema = VersionedTable.read(spark, t).schema
    val lo = "s00059000".getBytes("UTF-8")
    val hi = "s00059500".getBytes("UTF-8")
    val pred = GraftRowGroupFilter.build(
      typedOf(schema), Map.empty, Map("sk" -> (Some(lo), Some(hi))))
    assert(pred.nonEmpty)
    val got = readAll(file, schema, pred)
    assert(got.size < 60000, "string stats must skip row groups")
    val gotSet = got.toSet
    assert((59000L to 59500L).forall(gotSet.contains))
  }

  test("runtime In sets skip row groups on integral and string keys") {
    val t = s"$root/default/rgin"
    val file = oneSortedFile(t, 60000L)
    val schema = VersionedTable.read(spark, t).schema
    val intPred = GraftRowGroupFilter.build(
      typedOf(schema), Map.empty, Map.empty, inSets = Map("k" -> Set(59999L, 3L)))
    assert(intPred.nonEmpty)
    val gotI = readAll(file, schema, intPred)
    assert(gotI.size < 60000, "integral In set must skip row groups")
    assert(gotI.contains(59999L) && gotI.contains(3L))
    val strPred = GraftRowGroupFilter.build(
      typedOf(schema), Map.empty, Map.empty,
      strInSets = Map("sk" -> Set("s00059999", "s00000003")))
    assert(strPred.nonEmpty)
    val gotS = readAll(file, schema, strPred)
    assert(gotS.size < 60000, "string In set must skip row groups")
    assert(gotS.contains(59999L) && gotS.contains(3L))
  }

  test("empty In sets (contradictory runtime filters) build no predicate, never crash") {
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("k",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("sk",
        org.apache.spark.sql.types.StringType)))
    assert(GraftRowGroupFilter.build(typedOf(schema), Map.empty, Map.empty,
      inSets = Map("k" -> Set.empty[Long])).isEmpty)
    assert(GraftRowGroupFilter.build(typedOf(schema), Map.empty, Map.empty,
      strInSets = Map("sk" -> Set.empty[String])).isEmpty)
  }

  test("SQL results stay exact through the filtered reader on a multi-group file") {
    val t = s"$root/default/rge"
    oneSortedFile(t, 60000L)
    spark.conf.set("spark.sql.catalog.grg", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.grg.root", root)
    val got = spark.sql(
      "SELECT k FROM grg.default.rge WHERE k BETWEEN 59000 AND 59500 " +
        "AND sk >= 's00059000'")
      .collect().map(_.getLong(0)).toSet
    assert(got == (59000L to 59500L).toSet,
      "row-group skipping must be invisible to results")
  }

  test("TIMESTAMP bounds skip row groups (footer-qualified micros-INT64 leaves)") {
    val s = spark; import s.implicits._
    import org.apache.spark.sql.functions.{col, timestamp_seconds}
    val t = s"$root/default/rgts"
    val base = 1700000000L
    VersionedTable.commit(
      (1L to 60000L).map(k => (k, base + k)).toDF("k", "secs")
        .withColumn("ts", timestamp_seconds(col("secs"))).drop("secs")
        .coalesce(1).sortWithinPartitions("ts"),
      t, append = false, statsCols = Seq("ts"),
      writeOptions = Map("parquet.block.size" -> "65536"))
    val file = java.nio.file.Files
      .walk(java.nio.file.Paths.get(t, "data")).iterator.asScala
      .filter(p => p.toString.endsWith(".parquet") &&
        !p.getFileName.toString.startsWith("."))
      .map(_.toString).toSeq.head
    // the writeFiles override must have produced INT64 micros, not the
    // session default INT96 — that is what QUALIFIES the leaves
    val rd = org.apache.parquet.hadoop.ParquetFileReader.open(
      org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
        new org.apache.hadoop.fs.Path(file),
        new org.apache.hadoop.conf.Configuration()))
    val prim = try {
      val sch = rd.getFooter.getFileMetaData.getSchema
      sch.getType(sch.getFieldIndex("ts")).asPrimitiveType().getPrimitiveTypeName
    } finally rd.close()
    assert(prim == org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName.INT64,
      s"programmatic commits must store timestamps as INT64 micros, got $prim")
    val schema = VersionedTable.read(spark, t).schema
    val byCommit = GraftRowGroupFilter.perCommit(t,
      Seq("data/" + VersionedTable.dvKeyOf(file)), Set("ts"),
      Map("ts" -> ((base + 59000L) * 1000000L, (base + 59500L) * 1000000L)),
      Map.empty, Map.empty, Map.empty)
    val pred = GraftCatalogReaderFactory.filterFor(byCommit, file)
    assert(pred.nonEmpty, "micros-INT64 timestamp commits must build leaves")
    val got = readAll(file, schema, pred)
    assert(got.size < 60000,
      s"timestamp stats must skip row groups (got ${got.size} of 60000)")
    val gotSet = got.toSet
    assert((59000L to 59500L).forall(gotSet.contains),
      "a skipped row group may never hold a matching row")
    // SQL front door exactness through a timestamp range over the same table
    spark.conf.set("spark.sql.catalog.grg", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.grg.root", root)
    val sqlGot = spark.sql(
      s"""SELECT k FROM grg.default.rgts
         |WHERE ts BETWEEN timestamp_seconds(${base + 59000L})
         |  AND timestamp_seconds(${base + 59500L})""".stripMargin)
      .collect().map(_.getLong(0)).toSet
    assert(sqlGot == (59000L to 59500L).toSet)
  }

  test("DECIMAL bounds skip row groups (unscaled leaves match the footer primitive)") {
    val s = spark; import s.implicits._
    import org.apache.spark.sql.functions.col
    val t = s"$root/default/rgdec"
    VersionedTable.commit(
      (1L to 60000L).map(k => (k, k)).toDF("k", "price")
        .withColumn("price", col("price").cast("decimal(9,2)"))
        .coalesce(1).sortWithinPartitions("price"),
      t, append = false, statsCols = Seq("price"),
      writeOptions = Map("parquet.block.size" -> "65536"))
    val file = java.nio.file.Files
      .walk(java.nio.file.Paths.get(t, "data")).iterator.asScala
      .filter(p => p.toString.endsWith(".parquet") &&
        !p.getFileName.toString.startsWith("."))
      .map(_.toString).toSeq.head
    val schema = VersionedTable.read(spark, t).schema
    // DECIMAL(9,2) stores unscaled INT32: bounds 59000.00..59500.00 are
    // unscaled 5900000..5950000, and perCommit must emit INT leaves
    val byCommit = GraftRowGroupFilter.perCommit(t,
      Seq("data/" + VersionedTable.dvKeyOf(file)), Set("price"),
      Map("price" -> (5900000L, 5950000L)),
      Map.empty, Map.empty, Map.empty)
    val pred = GraftCatalogReaderFactory.filterFor(byCommit, file)
    assert(pred.nonEmpty, "INT32-unscaled decimal commits must build leaves")
    val got = readAll(file, schema, pred)
    assert(got.size < 60000,
      s"decimal stats must skip row groups (got ${got.size} of 60000)")
    val gotSet = got.toSet
    assert((59000L to 59500L).forall(gotSet.contains))
  }

  test("DOUBLE bounds skip row groups (sortable-bits bounds → exact double leaves)") {
    val s = spark; import s.implicits._
    import org.apache.spark.sql.functions.col
    val t = s"$root/default/rgdbl"
    VersionedTable.commit(
      (1L to 60000L).map(k => (k, k + 0.25)).toDF("k", "amount")
        .coalesce(1).sortWithinPartitions("amount"),
      t, append = false, statsCols = Seq("amount"),
      writeOptions = Map("parquet.block.size" -> "65536"))
    val file = java.nio.file.Files
      .walk(java.nio.file.Paths.get(t, "data")).iterator.asScala
      .filter(p => p.toString.endsWith(".parquet") &&
        !p.getFileName.toString.startsWith("."))
      .map(_.toString).toSeq.head
    val schema = VersionedTable.read(spark, t).schema
    // bounds in SORTABLE-BITS space under the tilde key, exactly as the
    // pushed-filter conversion produces them
    val byCommit = GraftRowGroupFilter.perCommit(t,
      Seq("data/" + VersionedTable.dvKeyOf(file)), Set("~amount"),
      Map("~amount" -> (VersionedTable.sortableBits(59000.25),
        VersionedTable.sortableBits(59500.25))),
      Map.empty, Map.empty, Map.empty)
    val pred = GraftCatalogReaderFactory.filterFor(byCommit, file)
    assert(pred.nonEmpty, "double commits must build bits→double leaves")
    val got = readAll(file, schema, pred)
    assert(got.size < 60000,
      s"double stats must skip row groups (got ${got.size} of 60000)")
    val gotSet = got.toSet
    assert((59000L to 59500L).forall(gotSet.contains),
      "a skipped row group may never hold a matching row")
  }

  test("one-sided DOUBLE bounds: open-lo emits a lone ltEq leaf; open-hi declines") {
    val s = spark; import s.implicits._
    val t = s"$root/default/rgdbl1"
    VersionedTable.commit(
      (1L to 60000L).map(k => (k, k + 0.25)).toDF("k", "amount")
        .coalesce(1).sortWithinPartitions("amount"),
      t, append = false, statsCols = Seq("amount"),
      writeOptions = Map("parquet.block.size" -> "65536"))
    val file = java.nio.file.Files
      .walk(java.nio.file.Paths.get(t, "data")).iterator.asScala
      .filter(p => p.toString.endsWith(".parquet") &&
        !p.getFileName.toString.startsWith("."))
      .map(_.toString).toSeq.head
    val schema = VersionedTable.read(spark, t).schema
    // `amount <= 1000.25` alone: the open lo side is the Long.MinValue
    // sentinel (NaN under the bijection) — NaN rows never match <=, so
    // the single ltEq leaf is sound and must skip the upper groups
    val loOpen = GraftRowGroupFilter.perCommit(t,
      Seq("data/" + VersionedTable.dvKeyOf(file)), Set("~amount"),
      Map("~amount" -> (Long.MinValue, VersionedTable.sortableBits(1000.25))),
      Map.empty, Map.empty, Map.empty)
    val pred = GraftCatalogReaderFactory.filterFor(loOpen, file)
    assert(pred.nonEmpty, "an upper-bounded double range must build its ltEq leaf")
    val got = readAll(file, schema, pred)
    assert(got.size < 60000,
      s"one-sided double stats must skip row groups (got ${got.size})")
    val gotSet = got.toSet
    assert((1L to 1000L).forall(gotSet.contains),
      "a skipped row group may never hold a matching row")
    // `amount >= x` alone must DECLINE: NaN rows match >= but parquet
    // writers exclude NaN from stats, so a gtEq-only leaf could drop a
    // block whose only matches are NaN
    val hiOpen = GraftRowGroupFilter.perCommit(t,
      Seq("data/" + VersionedTable.dvKeyOf(file)), Set("~amount"),
      Map("~amount" -> (VersionedTable.sortableBits(59000.25), Long.MaxValue)),
      Map.empty, Map.empty, Map.empty)
    assert(GraftCatalogReaderFactory.filterFor(hiOpen, file).isEmpty,
      "a lower-bounded-only double range must decline (NaN-match hazard)")
  }

  test("POSITIONAL vectors no longer disable row-group skipping; ordinals stay exact") {
    val s = spark; import s.implicits._
    import org.apache.spark.sql.functions.col
    val t = s"$root/default/rgpd"
    val file = oneSortedFile(t, 60000L)
    assert(rowGroups(file) >= 4)
    // positional delete of every k % 10 == 0 row: the file is sorted by
    // k, so doomed FILE ordinals are k-1 — any basePos desync under
    // group skipping would doom the wrong rows, which the value check
    // below catches
    VersionedTable.deleteWherePositional(spark, t, col("k") % 10L === 0L)
    val posFiles = java.nio.file.Files
      .walk(java.nio.file.Paths.get(t, "data")).iterator.asScala
      .filter(p => VersionedTable.isPosDeleteFile(p.toString) &&
        p.toString.endsWith(".parquet"))
      .map(_.toString).toSeq
    assert(posFiles.nonEmpty, "the positional delete must write a vector file")
    val schema = VersionedTable.read(spark, t).schema
    val pred = GraftRowGroupFilter.build(
      typedOf(schema), Map("k" -> (59000L, 59500L)), Map.empty)
    assert(pred.nonEmpty)
    val r = new GraftCatalogVectorReader(file, schema, posFiles, pred)
    val got = scala.collection.mutable.ArrayBuffer[Long]()
    try {
      while (r.next()) {
        val b = r.get()
        var i = 0
        while (i < b.numRows()) { got += b.column(0).getLong(i); i += 1 }
      }
    } finally r.close()
    assert(got.size < 54000,
      s"row groups must be skipped under a positional vector (got ${got.size})")
    val gotSet = got.toSet
    assert((59000L to 59500L).filter(_ % 10 != 0).forall(gotSet.contains),
      "a skipped row group may never hold a matching surviving row")
    assert(gotSet.forall(_ % 10 != 0),
      "doomed positions must stay doomed while groups skip (exact basePos)")
  }

  test("NESTED struct-leaf bounds skip row groups (dotted parquet paths)") {
    val s = spark; import s.implicits._
    import org.apache.spark.sql.functions.{col, struct}
    val t = s"$root/default/rgn"
    VersionedTable.commit(
      (1L to 60000L).map(k => (k, (s"l${k % 5}", k)))
        .toDF("id", "meta")
        .withColumn("meta",
          struct(col("meta._1").as("lang"), col("meta._2").as("n")))
        .coalesce(1).sortWithinPartitions("meta.n"),
      t, append = false, statsCols = Seq("id", "meta.n"),
      writeOptions = Map("parquet.block.size" -> "65536"))
    val file = java.nio.file.Files
      .walk(java.nio.file.Paths.get(t, "data")).iterator.asScala
      .filter(p => p.toString.endsWith(".parquet") &&
        !p.getFileName.toString.startsWith("."))
      .map(_.toString).toSeq.head
    assert(rowGroups(file) >= 4)
    val schema = VersionedTable.read(spark, t).schema
    val byCommit = GraftRowGroupFilter.perCommit(t,
      Seq("data/" + VersionedTable.dvKeyOf(file)), Set("meta.n"),
      Map("meta.n" -> (59000L, 59500L)), Map.empty, Map.empty, Map.empty)
    val pred = GraftCatalogReaderFactory.filterFor(byCommit, file)
    assert(pred.nonEmpty,
      "a nested struct-leaf bound must build its dotted row-group leaf")
    val got = readAll(file, schema, pred)
    assert(got.size < 60000,
      s"nested-leaf stats must skip row groups (got ${got.size} of 60000)")
    val gotSet = got.toSet
    assert((59000L to 59500L).forall(gotSet.contains),
      "a skipped row group may never hold a matching row")
    // end-to-end: the SQL scan over the dotted predicate plans exactly
    spark.conf.set("spark.sql.catalog.grgn", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.grgn.root", root)
    val viaSql = spark.sql(
      "SELECT id FROM grgn.default.rgn WHERE meta.n BETWEEN 59000 AND 59500")
      .collect().map(_.getLong(0)).toSet
    assert(viaSql == (59000L to 59500L).toSet)
  }

  test("widened columns skip row groups on BOTH generations (per-commit leaves)") {
    val s = spark; import s.implicits._
    val t = s"$root/default/rgw"
    // narrow generation: one sorted INT file with many row groups
    VersionedTable.commit(
      (1L to 60000L).map(k => (k.toInt, k * 2.0)).toDF("k", "d")
        .coalesce(1).sortWithinPartitions("k"),
      t, append = false, statsCols = Seq("k"),
      writeOptions = Map("parquet.block.size" -> "65536"))
    VersionedTable.widenColumn(spark, t,
      "k", org.apache.spark.sql.types.LongType)
    // wide generation: BIGINT keys past INT32, same row-group shape
    VersionedTable.commit(
      (1L to 60000L).map(k => (k + 5000000000L, k * 2.0)).toDF("k", "d")
        .coalesce(1).sortWithinPartitions("k"),
      t, append = true, statsCols = Seq("k"),
      writeOptions = Map("parquet.block.size" -> "65536"))
    val files = java.nio.file.Files
      .walk(java.nio.file.Paths.get(t, "data")).iterator.asScala
      .filter(p => p.toString.endsWith(".parquet") &&
        !p.getFileName.toString.startsWith(".") &&
        !p.getFileName.toString.contains("schema"))
      .map(_.toString).toSeq.sorted
    assert(files.size == 2, s"two generations expected: $files")
    val wide = VersionedTable.read(spark, t).schema // k is BIGINT now
    val byCommit = GraftRowGroupFilter.perCommit(t,
      files.map(f => "data/" + VersionedTable.dvKeyOf(f)), Set("k"),
      Map("k" -> (59000L, 59500L)), Map.empty, Map.empty, Map.empty)
    assert(byCommit.size == 2, s"one predicate per generation: $byCommit")
    // NARROW file: its predicate must carry INT32 leaves (the parquet
    // validator rejects LONG-vs-INT32 — this very filter used to be
    // declined wholesale) and must skip row groups
    val narrowPred = GraftCatalogReaderFactory.filterFor(byCommit, files.head)
    assert(narrowPred.nonEmpty)
    val gotNarrow = readAll(files.head, wide, narrowPred)
    assert(gotNarrow.size < 60000 && (59000L to 59500L).forall(gotNarrow.contains),
      s"narrow generation must skip row groups exactly: ${gotNarrow.size}")
    // WIDE file with a range only it can hold
    val byCommit2 = GraftRowGroupFilter.perCommit(t,
      files.map(f => "data/" + VersionedTable.dvKeyOf(f)), Set("k"),
      Map("k" -> (5000059000L, 5000059500L)), Map.empty, Map.empty, Map.empty)
    val widePred = GraftCatalogReaderFactory.filterFor(byCommit2, files.last)
    assert(widePred.nonEmpty)
    val gotWide = readAll(files.last, wide, widePred)
    assert(gotWide.size < 60000 &&
      (5000059000L to 5000059500L).forall(gotWide.contains),
      s"wide generation must skip row groups exactly: ${gotWide.size}")
    // and the SQL front door stays exact across the widened point read
    spark.conf.set("spark.sql.catalog.grg", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.grg.root", root)
    assert(spark.sql("SELECT k FROM grg.default.rgw WHERE k = 59250")
      .collect().map(_.getLong(0)).toSeq == Seq(59250L))
    assert(spark.sql("SELECT k FROM grg.default.rgw WHERE k = 5000059250")
      .collect().map(_.getLong(0)).toSeq == Seq(5000059250L))
  }
}
