package graft.sources

import org.apache.spark.sql.{DataFrame, DataFrameWriter, Row, SparkSession}
import org.apache.spark.sql.types.StructType

/** Source/sink surface of the engine (SURVEY.md §2.1 S5/S6).
  *
  * The reference's only "source" is a pre-loaded MySQL catalog and its only
  * "sink" is the client result grid; the engine generalizes both to the
  * formats a Spark deployment actually uses. Schemas are always explicit —
  * inference is disabled by passing a StructType, so a production run never
  * pays an inference scan and never drifts from the declared contract
  * (SURVEY §1.4).
  *
  * Scale notes: every reader hands Catalyst a `FileSourceScanExec` with
  * pushdown + pruning; `writePartitioned` lays data out for partition
  * pruning (PartitionSpec proves pruning fires); `writeBucketed` pre-hashes
  * rows so later equi-joins/aggregations on the bucket keys skip their
  * shuffle entirely — the 100 TB answer to repeated co-located joins.
  */
object Sources {
  def parquet(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  def csv(spark: SparkSession, path: String, schema: StructType,
          header: Boolean = true, delimiter: String = ","): DataFrame =
    spark.read.schema(schema)
      .option("header", header.toString)
      .option("delimiter", delimiter)
      .csv(path)

  def json(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema).json(path)

  /** ORC — the other columnar format a lakehouse migration meets. Same
    * scan properties as parquet (vectorized reader, predicate pushdown,
    * column pruning via ReadSchema). */
  def orc(spark: SparkSession, path: String): DataFrame =
    spark.read.orc(path)

  /** Quarantine-column readers: at ingest scale some fraction of a text
    * feed is always malformed, and a FAILFAST job that dies terabytes in
    * — or a silent DROPMALFORMED that loses rows — is operationally
    * wrong. PERMISSIVE mode with an explicit corrupt-record column turns
    * bad records into data: valid rows parse normally, broken ones land
    * whole in `corruptCol` (typed fields null), and the pipeline routes
    * them to a quarantine sink with one filter instead of failing.
    * (Spark caveat: a query pruned down to ONLY the corrupt column on the
    * raw scan is disallowed — materialize or select real columns
    * alongside it when routing.) */
  // Idempotent corrupt-column add: callers naturally reuse the schema of
  // a previous quarantine read (which already carries the column), and
  // schema.add would then create a duplicate field.
  private def withCorrupt(schema: StructType, corruptCol: String): StructType =
    if (schema.fieldNames.contains(corruptCol)) schema
    else schema.add(corruptCol, org.apache.spark.sql.types.StringType)

  def jsonWithQuarantine(spark: SparkSession, path: String, schema: StructType,
                         corruptCol: String = "_corrupt_record"): DataFrame =
    spark.read
      .schema(withCorrupt(schema, corruptCol))
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", corruptCol)
      .json(path)

  def csvWithQuarantine(spark: SparkSession, path: String, schema: StructType,
                        corruptCol: String = "_corrupt_record",
                        header: Boolean = true): DataFrame =
    spark.read
      .schema(withCorrupt(schema, corruptCol))
      .option("header", header.toString)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", corruptCol)
      .csv(path)

  /** JDBC source (the BASELINE "database dump or JDBC source" path).
    * `partitionColumn`/bounds split the read into `numPartitions` parallel
    * range queries — without them a JDBC read is a single-task scan, which
    * is never acceptable at scale. Exercised end-to-end in SourcesSpec
    * against an embedded Derby database (the one JDBC driver that ships
    * with the Spark distribution). */
  def jdbc(spark: SparkSession, url: String, table: String,
           partitionColumn: String, lowerBound: Long, upperBound: Long,
           numPartitions: Int,
           props: java.util.Properties = new java.util.Properties): DataFrame =
    spark.read.jdbc(url, table, partitionColumn, lowerBound, upperBound,
      numPartitions, props)

  /** Raw-media ingest for the multimodal path: Spark's `binaryFile`
    * source reads whole files as (path, modificationTime, length,
    * content) — `content` is exactly the opaque binary column the
    * Multimodal operators consume, so image/audio payloads enter the
    * engine without a decode step. `glob` keeps the listing to the
    * intended media extension BEFORE any file is opened. Scale shape:
    * listing is metadata work, payloads stream straight to executors,
    * and `spark.sql.files.maxPartitionBytes` bounds how many media
    * files co-reside in one task (binary files never split). */
  def binaryFiles(spark: SparkSession, path: String,
                  glob: String = "*"): DataFrame =
    spark.read.format("binaryFile")
      .option("pathGlobFilter", glob).load(path)

  /** Line-oriented text ingest with file lineage: one row per line plus
    * the source file path — the raw-crawl entry point (WET/plain-text
    * dumps) before any schema exists. Splittable, so a single huge dump
    * still parallelizes by byte range. */
  def textLines(spark: SparkSession, path: String): DataFrame =
    spark.read.text(path)
      .withColumn("src_file", org.apache.spark.sql.functions.input_file_name())
}

object Sinks {
  private def base(df: DataFrame, mode: String): DataFrameWriter[Row] =
    df.write.mode(mode)

  def writeParquet(df: DataFrame, path: String, mode: String = "overwrite"): Unit =
    base(df, mode).parquet(path)

  /** Hive-style partitioned layout (dir per key value) → partition pruning
    * for readers filtering on the partition columns. */
  def writePartitioned(df: DataFrame, path: String, partitionCols: Seq[String],
                       mode: String = "overwrite"): Unit =
    base(df, mode).partitionBy(partitionCols: _*).parquet(path)

  /** Dynamic partition overwrite — the incremental-backfill sink: with
    * `partitionOverwriteMode=dynamic`, an overwrite replaces ONLY the
    * partitions present in `df` and leaves every other partition's files
    * untouched (static mode would truncate the whole table first). This
    * is how a daily pipeline re-lands one day of a years-deep table; the
    * option is set per-write so the session default stays untouched. */
  def overwritePartitionsDynamic(df: DataFrame, path: String,
                                 partitionCols: Seq[String]): Unit =
    df.write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy(partitionCols: _*).parquet(path)

  /** Small-files compaction — the table-maintenance job every
    * append-heavy sink eventually needs (a streaming `foreachBatch`
    * lands one file per partition per batch; a year of 1-minute batches
    * is half a million tiny files whose listing and open costs dominate
    * scans). Sizes the target file count from the CURRENT layout
    * (RECURSIVE Σ file bytes / `targetBytes`, min 1 — a non-recursive
    * listing reads 0 bytes on any nested layout and would collapse the
    * table to one file), rewrites round-robin into `dest`, and returns
    * the file count written. Rewriting to a fresh directory keeps the
    * swap atomic at the metastore/path level — in-place rewrites lose
    * data on failure, so `dest == src` is refused. The rewrite is FLAT:
    * a Hive-partitioned table must be compacted per partition directory
    * (`compact(spark, s"$table/day=2024-01-07", ...)`), which preserves
    * the layout and is how a maintenance job scopes work anyway —
    * compacting only the partitions whose file counts drifted. */
  def compact(spark: SparkSession, src: String, dest: String,
              targetBytes: Long): Int = {
    require(targetBytes > 0, "targetBytes must be positive")
    val srcPath = new org.apache.hadoop.fs.Path(src)
    val destPath = new org.apache.hadoop.fs.Path(dest)
    val conf = spark.sparkContext.hadoopConfiguration
    val fs = srcPath.getFileSystem(conf)
    // Reject equal AND nested paths: overwrite-mode on an ancestor dest
    // deletes the source tree before the read job runs, and a dest inside
    // src lands the copy in the table it came from. Each path is qualified
    // against ITS OWN filesystem and compared as a full URI
    // (scheme + authority + path): dropping the scheme would spuriously
    // refuse two equal paths on DIFFERENT filesystems, and qualifying dest
    // against src's fs would mis-normalize a dest that lives elsewhere.
    def qualified(p: org.apache.hadoop.fs.Path): String =
      p.getFileSystem(conf).makeQualified(p).toUri.toString.stripSuffix("/") + "/"
    val srcQ = qualified(srcPath)
    val destQ = qualified(destPath)
    require(!srcQ.startsWith(destQ) && !destQ.startsWith(srcQ),
      "compact must rewrite into a fresh directory outside the source " +
        s"(src=$srcQ dest=$destQ would lose data on failure)")
    var total = 0L
    val it = fs.listFiles(srcPath, true)
    while (it.hasNext) {
      val st = it.next()
      if (st.getPath.getName.endsWith(".parquet")) total += st.getLen
    }
    val nFiles = math.max(1, math.ceil(total.toDouble / targetBytes).toInt)
    spark.read.parquet(src).repartition(nFiles)
      .write.mode("overwrite").parquet(dest)
    nFiles
  }

  /** Bucketed + sorted managed table: rows are hash-distributed into
    * `buckets` files per partition by `bucketCols`; subsequent joins or
    * aggregations keyed on them read co-located data with NO exchange. */
  def writeBucketed(df: DataFrame, table: String, buckets: Int,
                    bucketCols: Seq[String], mode: String = "overwrite"): Unit =
    base(df, mode)
      .bucketBy(buckets, bucketCols.head, bucketCols.tail: _*)
      .sortBy(bucketCols.head, bucketCols.tail: _*)
      .format("parquet")
      .saveAsTable(table)

  def writeOrc(df: DataFrame, path: String, mode: String = "overwrite"): Unit =
    base(df, mode).orc(path)

  /** Range-partitioned, sorted-within-file parquet layout — the flat-file
    * analog of a clustering key: rows are globally range-distributed by
    * `sortCols`, then sorted inside each output file, so every file (and
    * row group) covers a narrow, non-overlapping key range and parquet
    * min/max statistics become an effective coarse index. Readers
    * filtering on the leading sort column skip whole files — the data-
    * skipping layout a 100 TB table wants for its dominant access key.
    * SourcesSpec asserts the non-overlap property on the written files. */
  def writeSorted(df: DataFrame, path: String, sortCols: Seq[String],
                  numFiles: Option[Int] = None,
                  mode: String = "overwrite"): Unit = {
    import org.apache.spark.sql.functions.col
    // explicit file count pins the layout; without it AQE sizes the range
    // shuffle (and may coalesce small data into fewer files)
    val ranged = numFiles match {
      case Some(n) => df.repartitionByRange(n, sortCols.map(col): _*)
      case None => df.repartitionByRange(sortCols.map(col): _*)
    }
    ranged.sortWithinPartitions(sortCols.map(col): _*)
      .write.mode(mode).parquet(path)
  }

  /** Morton (z-order) interleave of pre-gridded coordinates: bit `b` of
    * grid column `i` lands at output bit `b·k + i` (k = number of
    * columns). A single static expression tree of shift/and/or terms —
    * fully codegen'd, no UDF. Exposed for the spec's exactness test. */
  def zValue(gridCols: Seq[org.apache.spark.sql.Column], bits: Int)
      : org.apache.spark.sql.Column = {
    import org.apache.spark.sql.functions.{lit, shiftleft, shiftright}
    val k = gridCols.size
    (0 until bits).flatMap { b =>
      gridCols.zipWithIndex.map { case (g, i) =>
        shiftleft(shiftright(g, b).bitwiseAND(lit(1L)), b * k + i)
      }
    }.reduce(_.bitwiseOR(_))
  }

  /** Z-ordered parquet layout — multi-dimensional clustering for tables
    * with MORE THAN ONE dominant access key. [[writeSorted]] gives
    * perfect skipping on its leading column and none on the others; the
    * Morton curve trades a little per-dim locality so that EVERY z column
    * gets a narrow per-file min/max envelope, and point/range filters on
    * any of them skip most files (and row groups) via parquet statistics.
    *
    * Shape: one tiny min/max aggregate over the input (at 100 TB this is
    * a metadata-cheap stats scan, or comes straight from catalog stats),
    * each column normalized onto a 2^bits equi-width grid, bits
    * interleaved per-row at scan speed, then the [[writeSorted]] range-
    * distribute + sort-within-file machinery over the z value. Equi-width
    * gridding keeps the pass single-action; a heavily skewed dim would
    * want equi-depth boundaries (approxQuantile) instead — same curve,
    * different gridding, noted here rather than implemented until a
    * workload needs it. */
  def writeZOrdered(df: DataFrame, path: String, zCols: Seq[String],
                    bits: Int = 16, numFiles: Option[Int] = None,
                    mode: String = "overwrite"): Unit = {
    import org.apache.spark.sql.functions.{col, floor, least, lit}
    require(zCols.size >= 2, "z-ordering needs at least two columns")
    require(zCols.size * bits <= 62, "z value must fit in a signed long")
    val aggs = zCols.flatMap(c => Seq(
      org.apache.spark.sql.functions.min(col(c)),
      org.apache.spark.sql.functions.max(col(c))))
    val stats = df.agg(aggs.head, aggs.tail: _*).head()
    // Empty input or an all-null z column has no min/max — no curve can
    // be computed, and there is nothing to cluster: write the rows (if
    // any) as-is rather than NPE-ing inside the grid construction.
    if ((0 until 2 * zCols.size).exists(stats.isNullAt)) {
      df.write.mode(mode).parquet(path)
      return
    }
    val cells = (1L << bits) - 1
    val grids = zCols.zipWithIndex.map { case (c, i) =>
      val (lo, hi) = (stats.getAs[Any](2 * i), stats.getAs[Any](2 * i + 1))
      val (loD, hiD) = (toDouble(lo), toDouble(hi))
      val field = df.schema(c)
      if (hiD == loD) lit(0L)
      else least(
        floor((asDouble(col(c), field.dataType) - lit(loD)) *
          (cells.toDouble / (hiD - loD))).cast("long"),
        lit(cells))
    }
    val zc = "__graft_z"
    val ranged = numFiles match {
      case Some(n) => df.withColumn(zc, zValue(grids, bits))
        .repartitionByRange(n, col(zc))
      case None => df.withColumn(zc, zValue(grids, bits))
        .repartitionByRange(col(zc))
    }
    ranged.sortWithinPartitions(col(zc)).drop(zc)
      .write.mode(mode).parquet(path)
  }

  // The column-side and driver-side conversions MUST agree on units
  // (dates → epoch days, timestamps → epoch micros): the grid scale is
  // computed from the driver-side min/max and applied to the column.
  private def asDouble(c: org.apache.spark.sql.Column,
                       dt: org.apache.spark.sql.types.DataType)
      : org.apache.spark.sql.Column = {
    import org.apache.spark.sql.functions.{unix_date, unix_micros}
    import org.apache.spark.sql.types.{DateType, NumericType, TimestampType}
    dt match {
      case DateType      => unix_date(c).cast("double")
      case TimestampType => unix_micros(c).cast("double")
      case _: NumericType => c.cast("double")
      case other => throw new IllegalArgumentException(
        s"z-order column must be numeric/date/timestamp, got $other")
    }
  }

  private def toDouble(v: Any): Double = v match {
    case n: java.lang.Number => n.doubleValue()
    case d: java.sql.Date => d.toLocalDate.toEpochDay.toDouble
    case t: java.sql.Timestamp =>
      t.getTime * 1000.0 + (t.getNanos % 1000000) / 1000.0
    case other => throw new IllegalArgumentException(
      s"z-order column must be numeric/date/timestamp, got ${other.getClass}")
  }

  def writeCsv(df: DataFrame, path: String, header: Boolean = true,
               mode: String = "overwrite"): Unit =
    base(df, mode).option("header", header.toString).csv(path)

  def writeJson(df: DataFrame, path: String, mode: String = "overwrite"): Unit =
    base(df, mode).json(path)
}
