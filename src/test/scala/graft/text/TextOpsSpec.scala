package graft.text

import org.apache.spark.sql.functions._
import graft.SparkSpec

class TextOpsSpec extends SparkSpec {
  import spark.implicits._

  private def fps(texts: (Long, String)*): Map[Long, Seq[Long]] =
    texts.toSeq.toDF("id", "text")
      .select(col("id"), TextOps.winnowingFingerprints(col("text"), k = 5, w = 4).as("fp"))
      .as[(Long, Seq[Long])].collect().toMap

  test("winnowing guarantee: shared run of >= w+k-1 tokens shares a fingerprint") {
    // 8-token shared run (= w+k-1) embedded in different contexts
    val shared = "alpha beta gamma delta epsilon zeta eta theta"
    val m = fps(
      1L -> s"one two three $shared four five six",
      2L -> s"red green blue $shared yellow purple pink",
      3L -> "completely disjoint vocabulary with no overlap at all here")
    assert(m(1L).toSet.intersect(m(2L).toSet).nonEmpty)
    assert(m(1L).toSet.intersect(m(3L).toSet).isEmpty)
    // fingerprints are sorted and distinct
    assert(m(1L) == m(1L).distinct.sorted)
  }

  test("quality score stays in [0,1] and ranks clean prose above punctuation soup") {
    val df = Seq(
      (1L, "the quick brown fox jumps over the lazy dog and runs to the forest " * 8),
      (2L, "!!! ??? ,,, ;;; ... ((( ))) !!! ??? ,,, ;;; ... ((( )))"),
      (3L, "")).toDF("id", "text")
    val m = df.select(col("id"), TextOps.qualityScore(col("text")).as("q"))
      .as[(Long, Double)].collect().toMap
    assert(m.values.forall(q => q >= 0.0 && q <= 1.0))
    assert(m(1L) > m(2L))
  }
}
