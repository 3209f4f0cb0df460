package graft.ops

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import graft.SparkSpec

class StreakCriteriaSpec extends SparkSpec {
  import spark.implicits._

  private def ts(i: Int): Timestamp = new Timestamp(1700000000000L + i * 3600000L)

  test("W3 composed: criteria resolved by inferred resolution flag long runs") {
    // integer-valued series: zero-dominated sorted diffs make A13 infer
    // resolution 0.1 (reference semantics), selecting tas criteria (nValues=24,
    // nDays=7): a 45-long run -> flagged; a 20-long run -> not
    val run45 = List.fill(45)(280.0)
    val run30 = List.fill(20)(281.0)
    val noise = (0 until 60).map(i => 270.0 + (i % 17)).toList
    val series = noise ++ run45 ++ noise.map(_ + 1) ++ run30 ++ noise
    val df = series.zipWithIndex.map { case (v, i) => ("s1", ts(i), v) }.toDF("k", "t", "v")
    val got = StreakOps.straightRepeatsWithCriteria(df, Seq("k"), "t", "v", "tas")
    val flaggedVals = got.filter(col("straight_streak")).select("v").distinct()
      .as[Double].collect().toSet
    assert(flaggedVals.contains(280.0))
    assert(!flaggedVals.contains(281.0))
  }
}
