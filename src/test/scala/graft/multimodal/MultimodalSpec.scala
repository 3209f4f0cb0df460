package graft.multimodal

import graft.SparkSpec
import MultimodalOps._

class MultimodalSpec extends SparkSpec {
  import spark.implicits._
  implicit private def s: org.apache.spark.sql.SparkSession = spark

  private def media(id: Long, kind: String, bytes: Array[Byte]) =
    MediaRow(id, kind, bytes, Map("codec" -> "stub"))

  test("decode batch is deterministic and typed") {
    val ds = Seq(
      media(1, "image", Array[Byte](10, 20, 30)),
      media(2, "video", Array[Byte](1, 2, 3, 4))).toDS()
    val out = decodeBatch(ds).collect().sortBy(_.id)
    assert(out(0).channels == 3 && out(0).nFrames == 1)
    assert(out(1).kind == "video" && out(1).nFrames > 1)
    // determinism
    assert(decodeBatch(ds).collect().sortBy(_.id).toSeq == out.toSeq)
  }

  test("byte features: normalized 16-bucket histogram") {
    val ds = Seq(media(1, "blob", Array.tabulate(256)(_.toByte))).toDS()
    val f = byteFeatures(ds).collect().head
    assert(f.length == 256)
    assert(approx(f.features.sum, 1.0, 1e-9))
    assert(f.features.forall(v => approx(v, 1.0 / 16, 1e-9))) // uniform bytes
  }

  test("frame sampling emits stride-spaced windows") {
    val ds = Seq(media(1, "video", Array.tabulate(100)(_.toByte))).toDS()
    val frames = sampleFrames(ds, frameBytes = 10, stride = 30).collect().sortBy(_._2)
    assert(frames.length == 4) // offsets 0,30,60,90
    assert(frames(1)._3.head == 30.toByte)
  }

  test("resize stub decimates payload and records provenance") {
    val ds = Seq(media(1, "image", Array.tabulate(10)(_.toByte))).toDS()
    val out = resizeStub(ds, 4).collect().head
    assert(out.payload.toSeq == Seq[Byte](0, 4, 8)) // ceil(10/4)=3, every 4th byte
    assert(out.meta("resize_stride") == "4" && out.meta("orig_bytes") == "10")
    // stride 1 is identity on the payload
    val id = resizeStub(ds, 1).collect().head
    assert(id.payload.toSeq == Array.tabulate(10)(_.toByte).toSeq)
  }

  test("DataFrame entry point attaches features by id") {
    val df = Seq((7L, "hello world")).toDF("doc_id", "text")
      .withColumn("payload", org.apache.spark.sql.functions.encode(
        org.apache.spark.sql.functions.col("text"), "UTF-8"))
    val out = withByteFeatures(df, "doc_id", "payload").collect().head
    assert(out.getLong(0) == 7L && out.getLong(1) == 11L)
  }
}
