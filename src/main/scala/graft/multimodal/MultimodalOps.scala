package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video as opaque `binary` columns with typed
  * metadata, processed in partition-batched typed kernels.
  *
  * The container has no codec libraries, so the DECODE step is a clearly-marked
  * deterministic stub ([[StubCodec]]); everything around it -- schema, batch shape,
  * partitioning, feature extraction on raw bytes -- is real and tested. In production
  * the stub body is replaced by an actual codec call with the identical signature; the
  * Spark plan does not change.
  *
  * Scale notes: media rows are large -- callers should store binaries in their own
  * column (Parquet keeps them in separate pages; projection pruning skips them unless
  * selected) and repartition by id range so a partition's batch fits executor memory.
  * The kernels below stream one row at a time inside `mapPartitions` (no
  * whole-partition materialization).
  */
object MultimodalOps {

  /** A media row: opaque payload + typed metadata. */
  final case class MediaRow(id: Long, kind: String, payload: Array[Byte],
                            meta: Map[String, String])

  /** Decoded media descriptor (what a real codec would emit). */
  final case class Decoded(id: Long, kind: String, width: Int, height: Int,
                           channels: Int, nFrames: Int)

  /** Fixed-length byte-level features: 16-bucket byte histogram (normalized), payload
    * length, entropy proxy. Real computation on real bytes -- used as the
    * "feature-extract" stage independent of any codec. */
  final case class ByteFeatures(id: Long, length: Long, features: Array[Double])

  /** STUB codec: deterministically fakes a decode from the payload's leading bytes.
    * ??? -- replace with a real image/audio decoder in production; the container ships
    * no codec libraries. Kept total and deterministic so plumbing tests are stable. */
  object StubCodec {
    def decode(kind: String, payload: Array[Byte]): (Int, Int, Int, Int) = {
      val b = (i: Int) => if (payload.length > i) payload(i) & 0xff else 0
      // fake-but-stable dimensions derived from content
      val w = 16 + (b(0) % 64) * 8
      val h = 16 + (b(1) % 64) * 8
      val ch = if (kind == "audio") 1 else 3
      val frames = if (kind == "video") 1 + b(2) % 300 else 1
      (w, h, ch, frames)
    }
  }

  /** Batched decode: one typed `mapPartitions` pass (the Scala analog of a Pandas UDF
    * over mapInPandas -- same batch shape, arrow-free). */
  def decodeBatch(ds: Dataset[MediaRow])(implicit spark: SparkSession): Dataset[Decoded] = {
    import spark.implicits._
    ds.mapPartitions(_.map { r =>
      val (w, h, ch, f) = StubCodec.decode(r.kind, r.payload)
      Decoded(r.id, r.kind, w, h, ch, f)
    })
  }

  /** Byte-histogram features (16 buckets, normalized) + length. Streams bytes; no
    * per-partition materialization. */
  def byteFeatures(ds: Dataset[MediaRow])(implicit spark: SparkSession): Dataset[ByteFeatures] = {
    import spark.implicits._
    ds.mapPartitions(_.map { r =>
      val hist = new Array[Double](16)
      var i = 0
      while (i < r.payload.length) { hist((r.payload(i) & 0xff) >> 4) += 1.0; i += 1 }
      val n = math.max(r.payload.length, 1).toDouble
      var j = 0
      while (j < 16) { hist(j) /= n; j += 1 }
      ByteFeatures(r.id, r.payload.length.toLong, hist)
    })
  }

  /** Frame sampling: fixed-stride byte-window slices standing in for video frame
    * extraction (window size / stride are what a codec-backed version would use).
    * Emits (id, frameIdx, frame) rows via flatMap -- the UDTF shape. */
  def sampleFrames(ds: Dataset[MediaRow], frameBytes: Int, stride: Int)
                  (implicit spark: SparkSession): Dataset[(Long, Int, Array[Byte])] = {
    import spark.implicits._
    ds.flatMap { r =>
      val n = r.payload.length
      Iterator.range(0, math.max(n - frameBytes + 1, 0), stride).zipWithIndex.map {
        case (off, idx) => (r.id, idx, java.util.Arrays.copyOfRange(r.payload, off, off + frameBytes))
      }
    }
  }

  /** Resize stage: deterministic stride-decimation of the payload standing in for an
    * image resize (??? -- in production the body becomes codec-decode -> bilinear
    * resample -> re-encode; signature and plan shape are identical). Output payload is
    * every `stride`-th byte, so downstream stages see a genuinely smaller binary and
    * the metadata records the provenance -- the contract a real resize must keep. */
  def resizeStub(ds: Dataset[MediaRow], stride: Int)
                (implicit spark: SparkSession): Dataset[MediaRow] = {
    require(stride >= 1, "stride must be >= 1")
    import spark.implicits._
    ds.mapPartitions(_.map { r =>
      val n = r.payload.length
      val out = new Array[Byte]((n + stride - 1) / stride)
      var i = 0
      while (i < out.length) { out(i) = r.payload(i * stride); i += 1 }
      r.copy(payload = out,
        meta = r.meta + ("resize_stride" -> stride.toString, "orig_bytes" -> n.toString))
    })
  }

  /** DataFrame-level entry: attach byte features to any (id, binary) pair without the
    * typed API -- for SQL-facing pipelines. */
  def withByteFeatures(df: DataFrame, idCol: String, binCol: String)
                      (implicit spark: SparkSession): DataFrame = {
    import spark.implicits._
    val typed = df.select(col(idCol).cast("long").as("id"), col(binCol).as("payload"))
      .as[(Long, Array[Byte])]
      .map { case (id, p) => MediaRow(id, "blob", if (p == null) Array.empty else p, Map.empty) }
    byteFeatures(typed).toDF("id", "length", "features")
      .withColumnRenamed("id", idCol)
  }
}
