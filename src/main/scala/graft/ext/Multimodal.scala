package graft.ext

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Multimodal-column plumbing (SURVEY.md §7.6): media as opaque `binary`
  * payloads with typed metadata, processed by per-partition iterator
  * transforms — the Scala analog of a vectorized Python `mapInPandas`
  * stage. The Spark-side mechanics (schema, encoders, partition-iterator
  * batching, post-transform aggregation) are real and tested; the codec
  * itself is a STUB — this container has no image/audio libraries, so
  * `decodeStub` derives deterministic fake features from the raw bytes.
  * Swapping in a real decoder changes only the function body, not the
  * pipeline shape.
  *
  * Scale: `mapPartitions` keeps the decode batched per partition (one
  * codec init per partition, not per row — the same reason mapInPandas
  * exists), stays inside the existing partitioning (no shuffle), and
  * pipelines into downstream aggregations. Media payloads at 100 TB are
  * the dominant bytes; nothing here ever collects them to the driver.
  */
object Multimodal {
  /** A media row: id + typed metadata + opaque payload. */
  case class MediaRow(doc_id: Long, format: String, n_bytes: Long,
                      payload: Array[Byte])

  /** Extracted features: fixed-width histogram + summary stats. */
  case class MediaFeatures(doc_id: Long, format: String, n_bytes: Long,
                           bucket: Int, count: Long)

  val HistogramBuckets = 16

  /** Synthesize a media relation from the documents table: the UTF-8
    * bytes of `text` stand in for an encoded image/audio payload, with a
    * deterministic fake format tag. Payload synthesis is built-ins only
    * (`encode`), so it runs columnar until the decode stage. `n_bytes` is
    * the PAYLOAD byte count (octet_length) — `length(text)` counts
    * characters and diverges from the binary payload on any non-ASCII
    * document. */
  def mediaFromDocuments(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id").cast(LongType).as("doc_id"),
      element_at(array(lit("png"), lit("jpeg"), lit("wav")),
        (col("doc_id") % 3 + 1).cast("int")).as("format"),
      octet_length(col("text")).cast(LongType).as("n_bytes"),
      encode(col("text"), "UTF-8").as("payload"))

  /** STUB decoder: a real implementation would decode the image/audio and
    * emit perceptual features; here the deterministic fake is a histogram
    * of `byte mod HistogramBuckets`. The signature and batching are the
    * real contract. */
  def decodeStub(payload: Array[Byte]): Array[Long] = {
    val hist = new Array[Long](HistogramBuckets)
    var i = 0
    while (i < payload.length) {
      hist(((payload(i) % HistogramBuckets) + HistogramBuckets) % HistogramBuckets) += 1
      i += 1
    }
    hist
  }

  /** Per-partition feature extraction: one row per (doc, bucket) with a
    * non-zero count. Runs the stub codec once per row inside a partition
    * iterator — no shuffle, no driver involvement. */
  def extractFeatures(media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.flatMap { r =>
        val hist = decodeStub(r.payload)
        hist.iterator.zipWithIndex.collect {
          case (cnt, bucket) if cnt > 0 =>
            MediaFeatures(r.doc_id, r.format, r.n_bytes, bucket, cnt)
        }
      }
    }
  }

  /** End-to-end media featurization over the documents table. */
  def documentByteHistogram(spark: SparkSession, docs: DataFrame): DataFrame = {
    import spark.implicits._
    extractFeatures(mediaFromDocuments(docs).as[MediaRow]).toDF()
  }

  /** Resize stub: a real image resize decodes, scales, and re-encodes;
    * the stub downsamples the payload by averaging fixed `factor`-byte
    * blocks (deterministic; output length = ceil(n/factor), the 1-D
    * analog of area-average scaling). As with [[decodeStub]], the
    * partition-iterator batching and the payload-in/payload-out row
    * contract are the real interface a codec would slot into. */
  def resizeStub(media: Dataset[MediaRow], factor: Int): Dataset[MediaRow] = {
    require(factor > 0, s"factor must be positive: $factor")
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.map { r =>
        val n = r.payload.length
        val out = new Array[Byte]((n + factor - 1) / factor)
        var i = 0
        while (i < out.length) {
          var s = 0
          var j = i * factor
          val end = math.min(j + factor, n)
          while (j < end) { s += r.payload(j) & 0xff; j += 1 }
          out(i) = (s / (end - i * factor)).toByte
          i += 1
        }
        r.copy(n_bytes = out.length.toLong, payload = out)
      }
    }
  }

  /** Frame sampling stub for "video" payloads: every `stride`-th byte
    * starts a frame of `frameLen` bytes. Real frame extraction swaps the
    * slicing for a container parser; the partition-iterator shape stays. */
  def sampleFrames(media: Dataset[MediaRow], stride: Int, frameLen: Int)
  : Dataset[(Long, Int, Array[Byte])] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.flatMap { r =>
        Iterator.range(0, r.payload.length, stride).zipWithIndex.map {
          case (off, idx) =>
            (r.doc_id, idx, r.payload.slice(off, math.min(off + frameLen, r.payload.length)))
        }
      }
    }
  }
}
