package graft.pipeline

import org.apache.spark.sql.functions._
import graft.SparkSpec

class CurationPipelineSpec extends SparkSpec {
  import spark.implicits._

  private val cfg = CurationPipeline.Config(
    minQuality = 0.0,
    markers = Map("aa" -> Seq("alpha"), "bb" -> Seq("beta")),
    rates = Map("aa" -> 1.0, "bb" -> 1.0), defaultRate = 1.0)

  test("funnel stages are monotone and dedup keeps one survivor per fingerprint") {
    val docs = Seq(
      (1L, "alpha alpha words here and more padding text to pass along fine"),
      (2L, "ALPHA alpha words here and more padding text to pass along fine"), // dup of 1
      (3L, "beta beta other content entirely different from the first group"),
      (4L, "zz qq xx vv")) // no marker hits -> 'und', dropped at lang stage
      .toDF("doc_id", "text")
    val ann = CurationPipeline.annotate(docs, "doc_id", "text", cfg)
    val f = CurationPipeline.funnel(ann)
      .as[(Long, Long, Long, Long, Long)].collect().head
    val (total, q, l, d, s) = f
    assert(total == 4 && q == 4 && l == 3 && d == 2 && s == 2)
    assert(total >= q && q >= l && l >= d && d >= s)
    // the duplicate group keeps the smallest id
    val kept = ann.filter(col("keep_dedup")).select("doc_id").as[Long].collect().sorted
    assert(kept.toSeq == Seq(1L, 3L))
  }

  test("a gated-out duplicate never shadows a surviving one") {
    // docs 1 and 2 share a fingerprint (whitespace-insensitive), but doc 1's raw
    // text is short so it fails the quality gate; doc 2 (space-padded, higher
    // length score) survives -> doc 2 must win the dedup slot despite its larger id
    val pad = " " * 400
    val docs = Seq(
      (1L, "xx yy zz"),
      (2L, s"xx yy$pad zz")).toDF("doc_id", "text")
    val c2 = cfg.copy(minQuality = 0.5, markers = Map("aa" -> Seq("xx")))
    val ann = CurationPipeline.annotate(docs, "doc_id", "text", c2)
    assert(ann.filter(col("keep_quality")).select("doc_id").as[Long].collect().toSeq
      == Seq(2L))
    val kept = ann.filter(col("keep_dedup")).select("doc_id").as[Long].collect()
    assert(kept.toSeq == Seq(2L))
  }
}
