package graft

import java.nio.file.Files

import org.apache.spark.sql.execution.ExplainMode
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.sources.{Sinks, Sources}

/** Round-trip specs for the source/sink surface. */
class SourcesSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(prefix: String): String =
    Files.createTempDirectory(prefix).toString

  private val schema = StructType(Seq(
    StructField("id", LongType), StructField("name", StringType),
    StructField("v", DoubleType)))

  private val data = Seq((1L, "a", 1.5), (2L, "b", 2.5), (3L, "c", 3.5))

  test("csv round-trip with explicit schema (no inference scan)") {
    val dir = tmp("graft_csv")
    Sinks.writeCsv(data.toDF("id", "name", "v"), dir)
    val back = Sources.csv(spark, dir, schema)
    assert(back.schema == schema)
    assert(back.orderBy("id").collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
      .toSeq == data)
  }

  test("json round-trip with explicit schema") {
    val dir = tmp("graft_json")
    Sinks.writeJson(data.toDF("id", "name", "v"), dir)
    val back = Sources.json(spark, dir, schema)
    assert(back.orderBy("id").count() == 3)
    assert(back.schema == schema)
  }

  test("orc round-trip preserves schema and pushes filters to the scan") {
    val dir = tmp("graft_orc")
    Sinks.writeOrc(data.toDF("id", "name", "v"), dir)
    val back = Sources.orc(spark, dir)
    assert(back.orderBy("id").collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
      .toSeq == data)
    val p = back.filter(col("id") > 1L).select("id", "v")
      .queryExecution.explainString(ExplainMode.fromString("formatted"))
    // same scan contract as parquet: pushdown + column pruning visible
    assert(p.contains("PushedFilters: [IsNotNull(id), GreaterThan(id,1)]"), p)
    assert(p.contains("ReadSchema: struct<id:bigint,v:double>"), p)
  }

  test("bucketed table: equi-join on bucket key plans without an exchange on the bucketed sides") {
    spark.sql("DROP TABLE IF EXISTS bkt_a")
    spark.sql("DROP TABLE IF EXISTS bkt_b")
    // a previously failed run can leave the managed location behind with
    // no catalog entry; clear it so saveAsTable can claim the path
    val wh = new java.io.File(spark.conf.get("spark.sql.warehouse.dir")
      .stripPrefix("file:"))
    Seq("bkt_a", "bkt_b").foreach { t =>
      val d = new java.io.File(wh, t)
      if (d.exists()) {
        d.listFiles().foreach(_.delete()); d.delete()
      }
    }
    val df = (1 to 1000).map(i => (i.toLong, s"n$i")).toDF("k", "name")
    Sinks.writeBucketed(df, "bkt_a", 4, Seq("k"))
    Sinks.writeBucketed(df, "bkt_b", 4, Seq("k"))
    // tiny test tables would broadcast (bucketing bypassed); force the
    // shuffle-join path the bucketing exists to optimize
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table("bkt_a").join(spark.table("bkt_b"), "k")
      val p = joined.queryExecution.explainString(ExplainMode.fromString("formatted"))
      assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin"), p)
      // bucketed scan feeds the join directly: no Exchange below the join
      assert(!p.contains("Exchange hashpartitioning(k"), p)
      assert(joined.count() == 1000)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("binaryFile source feeds the multimodal decode path; glob filters before open") {
    val dir = tmp("graft_bin")
    // a real 1×1 PPM on disk — the content column feeds the REAL decoder
    val ppm = graft.ext.Multimodal.encodePpm(
      graft.ext.Multimodal.DecodedImage(1, 1, Array[Byte](7, 8, 9)))
    java.nio.file.Files.write(java.nio.file.Paths.get(dir, "a.img"), ppm)
    java.nio.file.Files.write(java.nio.file.Paths.get(dir, "b.img"),
      Array[Byte](5, 6))
    java.nio.file.Files.write(java.nio.file.Paths.get(dir, "skip.txt"),
      "not media".getBytes("UTF-8"))
    val media = Sources.binaryFiles(spark, dir, glob = "*.img")
    assert(media.count() == 2) // the .txt never enters the scan
    val r = media.select(col("path"), col("length"), col("content"))
      .orderBy(col("length").desc).collect()
    assert(r(0).getAs[Long]("length") == ppm.length.toLong)
    // the content column is exactly what the multimodal codec decodes
    val img = graft.ext.Multimodal.decodeImage(
      r(0).getAs[Array[Byte]]("content"))
    assert(img.width == 1 && img.height == 1)
    assert(img.rgb.toSeq == Seq[Byte](7, 8, 9))
  }

  test("textLines reads one row per line with file lineage") {
    val dir = tmp("graft_txt")
    java.nio.file.Files.write(java.nio.file.Paths.get(dir, "d1.txt"),
      "line one\nline two\n".getBytes("UTF-8"))
    val r = Sources.textLines(spark, dir).collect()
    assert(r.map(_.getAs[String]("value")).sorted.toSeq ==
      Seq("line one", "line two"))
    assert(r.forall(_.getAs[String]("src_file").endsWith("d1.txt")))
  }

  test("dynamic partition overwrite replaces only the landed partitions") {
    val dir = tmp("graft_dynpart")
    val full = Seq((1L, "p1", 1.0), (2L, "p2", 2.0), (3L, "p3", 3.0))
      .toDF("id", "part", "v")
    Sinks.writePartitioned(full, dir, Seq("part"))
    // re-land ONLY p2 with a corrected value
    Sinks.overwritePartitionsDynamic(
      Seq((20L, "p2", 99.0)).toDF("id", "part", "v"), dir, Seq("part"))
    val back = Sources.parquet(spark, dir)
      .select("id", "part", "v").orderBy("part", "id").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
    // p1 and p3 untouched; p2 fully replaced (old id=2 gone)
    assert(back.toSeq == Seq((1L, "p1", 1.0), (20L, "p2", 99.0), (3L, "p3", 3.0)))
  }

  test("compact rewrites a many-small-files layout into the computed file count") {
    val dir = tmp("graft_smallfiles")
    val dest = tmp("graft_compacted")
    (1 to 8).foreach { i => // 8 appends -> at least 8 tiny files
      Seq((i.toLong, s"row$i")).toDF("id", "s")
        .coalesce(1).write.mode("append").parquet(dir)
    }
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    def parquetFiles(p: String): Int =
      fs.listStatus(new org.apache.hadoop.fs.Path(p))
        .count(st => st.isFile && st.getPath.getName.endsWith(".parquet"))
    assert(parquetFiles(dir) >= 8)
    // generous target -> everything fits in one file
    val n = Sinks.compact(spark, dir, dest, targetBytes = 1L << 30)
    assert(n == 1 && parquetFiles(dest) == 1)
    // nothing lost
    assert(Sources.parquet(spark, dest).orderBy("id").collect()
      .map(_.getLong(0)).toSeq == (1L to 8L))
    // in-place rewrite refused (it would lose data on failure), and so
    // are nested paths in either direction: an ancestor dest's overwrite
    // would delete the source tree before the read job runs
    intercept[IllegalArgumentException] {
      Sinks.compact(spark, dir, dir, targetBytes = 1L << 30)
    }
    intercept[IllegalArgumentException] {
      Sinks.compact(spark, s"$dir/part=p1", dir, targetBytes = 1L << 30)
    }
    intercept[IllegalArgumentException] {
      Sinks.compact(spark, dir, s"$dir/compacted", targetBytes = 1L << 30)
    }
  }

  test("compact sizes from a RECURSIVE listing (partitioned layouts are not read as 0 bytes)") {
    val dir = tmp("graft_partfiles")
    val dest = tmp("graft_partcompacted")
    Sinks.writePartitioned(
      (1 to 200).map(i => (i.toLong, s"p${i % 4}", s"payload$i"))
        .toDF("id", "part", "s"), dir, Seq("part"))
    // all bytes live in part=*/ subdirectories; a tight target must see
    // them (the non-recursive listing computed total=0 -> nFiles=1)
    val n = Sinks.compact(spark, dir, dest, targetBytes = 2000)
    assert(n >= 2)
    assert(Sources.parquet(spark, dest).count() == 200)
  }

  test("jdbc source: partitioned read against an embedded database") {
    // Derby ships with the Spark distribution (/opt/spark/jars), so the
    // JDBC path is testable offline: in-memory DB, 100 rows, read back as
    // 4 parallel range queries over the partition column.
    val url = "jdbc:derby:memory:graftdb;create=true"
    val conn = java.sql.DriverManager.getConnection(url)
    try {
      val st = conn.createStatement()
      try st.execute("DROP TABLE items") catch { case _: Throwable => () }
      st.execute("CREATE TABLE items (id BIGINT NOT NULL, name VARCHAR(20), v DOUBLE)")
      val ps = conn.prepareStatement("INSERT INTO items VALUES (?, ?, ?)")
      (1 to 100).foreach { i =>
        ps.setLong(1, i.toLong); ps.setString(2, s"n$i"); ps.setDouble(3, i / 2.0)
        ps.addBatch()
      }
      ps.executeBatch()
    } finally conn.close()

    val df = Sources.jdbc(spark, url, "items",
      partitionColumn = "id", lowerBound = 1L, upperBound = 101L,
      numPartitions = 4)
    assert(df.rdd.getNumPartitions == 4) // four parallel range scans
    assert(df.count() == 100)
    val r42 = df.filter(col("id") === 42L).collect()(0)
    assert(r42.getAs[String]("NAME") == "n42" && r42.getAs[Double]("V") == 21.0)
  }

  test("writeSorted produces non-overlapping per-file key ranges (data skipping)") {
    val dir = tmp("graft_sorted")
    val df = spark.range(1000).toDF("id")
      .withColumn("v", col("id") % 7)
      .repartition(5) // scramble first so the range layout does real work
    Sinks.writeSorted(df, dir, Seq("id"), numFiles = Some(4))
    val files = new java.io.File(dir).listFiles()
      .filter(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet"))
    assert(files.length > 1, s"expected a multi-file layout, got ${files.length}")
    // every file covers a disjoint id range → min/max stats skip files
    val ranges = files.map { f =>
      val r = spark.read.parquet(f.getAbsolutePath)
        .agg(min(col("id")), max(col("id"))).first()
      (r.getLong(0), r.getLong(1))
    }.sortBy(_._1)
    ranges.sliding(2).foreach {
      case Array((_, hi), (lo, _)) => assert(hi < lo, s"overlap: $hi >= $lo")
      case _ => ()
    }
    assert(spark.read.parquet(dir).count() == 1000)
  }

  test("quarantine reader parses good rows and captures malformed ones whole") {
    import org.apache.spark.sql.types.{LongType, StringType, StructType}
    val dir = tmp("graft_quarantine")
    new java.io.File(dir).mkdirs()
    val pw = new java.io.PrintWriter(s"$dir/feed.json")
    pw.println("""{"id": 1, "name": "ok"}""")
    pw.println("""{"id": broken!!""")
    pw.println("""{"id": 3, "name": "also ok"}""")
    pw.close()
    val schema = new StructType().add("id", LongType).add("name", StringType)
    // Spark disallows pruning a raw scan down to ONLY the corrupt column
    // (UNSUPPORTED_FEATURE.QUERY_ONLY_CORRUPT_RECORD_COLUMN) — collect
    // the full parsed rows, as a quarantine-routing sink would.
    val rows = Sources.jsonWithQuarantine(spark, s"$dir/feed.json", schema).collect()
    val (bad, good) = rows.partition(r =>
      r.getAs[String]("_corrupt_record") != null)
    assert(good.length == 2 && bad.length == 1)
    assert(bad.head.getAs[String]("_corrupt_record").contains("broken"))
    assert(good.map(_.getAs[String]("name")).toSet == Set("ok", "also ok"))
  }

  test("zValue interleaves bits exactly (Morton order)") {
    import spark.implicits._
    // x=2 (10₂), y=1 (01₂), bits=2: bit b of col i → position b·2+i
    //   b0: x→pos0 (0), y→pos1 (1); b1: x→pos2 (1), y→pos3 (0) → 0110₂ = 6
    val r = Seq((2L, 1L)).toDF("x", "y")
      .select(Sinks.zValue(Seq(col("x"), col("y")), 2)).first().getLong(0)
    assert(r == 6L)
  }

  test("writeZOrdered bounds per-file envelopes on BOTH dims (multi-key skipping)") {
    val dir = tmp("graft_zorder")
    // two independent uniform dims: a single-column sort layout leaves the
    // second dim spanning ~the full domain in every file; the z layout
    // must bound both
    val df = spark.range(4096).toDF("id")
      .withColumn("a", col("id") % 64)
      .withColumn("b", (col("id") / lit(64)).cast("long"))
      .repartition(7) // scramble so the curve layout does real work
    Sinks.writeZOrdered(df, dir, Seq("a", "b"), bits = 6, numFiles = Some(16))
    val files = new java.io.File(dir).listFiles()
      .filter(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet"))
    assert(files.length > 4, s"expected a multi-file layout, got ${files.length}")
    val spreads = files.map { f =>
      val r = spark.read.parquet(f.getAbsolutePath)
        .agg(min(col("a")), max(col("a")), min(col("b")), max(col("b"))).first()
      (r.getLong(1) - r.getLong(0), r.getLong(3) - r.getLong(2))
    }
    // 16 files over a 64×64 grid: each file's bounding box must cover well
    // under the full 63-wide domain on each dim (a sorted-by-a layout
    // would leave b's spread at ~63 in every file)
    val (avgA, avgB) = (spreads.map(_._1).sum.toDouble / spreads.length,
      spreads.map(_._2).sum.toDouble / spreads.length)
    assert(avgA < 32 && avgB < 32, s"avg spreads a=$avgA b=$avgB of 63")
    assert(spark.read.parquet(dir).count() == 4096)
  }

  test("writeZOrdered degrades gracefully on empty input (no curve to compute)") {
    val dir = tmp("graft_zorder_empty")
    val df = spark.range(10).toDF("a").withColumn("b", col("a"))
      .filter(lit(false))
    Sinks.writeZOrdered(df, dir, Seq("a", "b"), bits = 4)
    assert(spark.read.parquet(dir).count() == 0)
  }

  test("quarantine reader accepts a schema that already carries the corrupt column") {
    import org.apache.spark.sql.types.{LongType, StringType, StructType}
    val dir = tmp("graft_quarantine2")
    new java.io.File(dir).mkdirs()
    val pw = new java.io.PrintWriter(s"$dir/feed.json")
    pw.println("""{"id": 1, "name": "ok"}"""); pw.close()
    val withCol = new StructType().add("id", LongType).add("name", StringType)
      .add("_corrupt_record", StringType) // e.g. reused from a prior read
    val rows = Sources.jsonWithQuarantine(spark, s"$dir/feed.json", withCol).collect()
    assert(rows.length == 1 && rows.head.getAs[Long]("id") == 1L)
  }

  test("writeZOrdered accepts date z-columns (unit-consistent gridding)") {
    val dir = tmp("graft_zorder_date")
    val df = spark.range(256).toDF("id")
      .withColumn("d", date_add(lit(java.sql.Date.valueOf("2024-01-01")),
        (col("id") % 16).cast("int")))
      .withColumn("v", (col("id") / lit(16)).cast("long"))
    Sinks.writeZOrdered(df, dir, Seq("d", "v"), bits = 4, numFiles = Some(4))
    // round-trips completely and no row was nulled out of the curve
    assert(spark.read.parquet(dir).filter(col("d").isNull).count() == 0)
    assert(spark.read.parquet(dir).count() == 256)
  }

  test("partitioned sink + pruned source") {
    val dir = tmp("graft_part")
    Sinks.writePartitioned(
      data.toDF("id", "name", "v").withColumn("part", col("id") % 2), dir, Seq("part"))
    val back = Sources.parquet(spark, dir).filter(col("part") === 0)
    assert(back.count() == 1)
  }
}
