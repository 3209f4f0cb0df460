package graft.pipeline

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.core.Flags

/** Pipeline-level buoy-check wiring (flags 1/2, `qaqc_buoy_check.py`): the stage
  * composes into [[QaqcPipeline.run]] ahead of the standard checks and fires ONLY
  * for MARITIME/NDBC stations in the broadcast catalogs — identical observations
  * at a non-maritime station come through unflagged. */
class BuoyCheckSpec extends SparkSpec {
  import spark.implicits._
  private implicit val s: org.apache.spark.sql.SparkSession = spark

  private def ts(v: String) = java.sql.Timestamp.valueOf(v)

  test("buoy stage: disestablishment, adrift window, ferry hours — maritime-gated") {
    val rows = Seq(
      // MARITIME_PTAC1 disestablished 2022-02-09: one row before, one after
      ("MARITIME_PTAC1", ts("2022-02-01 00:00:00"), 280.0, 5.0),
      ("MARITIME_PTAC1", ts("2022-03-01 00:00:00"), 281.0, 6.0),
      // NDBC_46044 adrift 2015-05-02 10:40 .. 2015-05-03 15:50: inside + after
      ("NDBC_46044", ts("2015-05-02 12:00:00"), 282.0, 7.0),
      ("NDBC_46044", ts("2015-06-01 00:00:00"), 283.0, 8.0),
      // MARITIME_PTWW1 ferry hours 06-20 local: wind-only flag 1
      ("MARITIME_PTWW1", ts("2015-05-02 12:00:00"), 284.0, 9.0),
      ("MARITIME_PTWW1", ts("2015-05-02 03:00:00"), 285.0, 10.0),
      // potential-issue buoy: whole record flagged
      ("NDBC_46290", ts("1995-01-01 00:00:00"), 286.0, 11.0),
      // non-maritime station at the SAME timestamps: must stay clean
      ("CIMIS_2", ts("2022-03-01 00:00:00"), 287.0, 12.0),
      ("CIMIS_2", ts("2015-05-02 12:00:00"), 288.0, 13.0))
      .toDF("station", "time", "tas", "sfcWind")
      .withColumn("tas_eraqc", lit(null).cast("int"))
      .withColumn("sfcWind_eraqc", lit(null).cast("int"))

    val stages = QaqcPipeline.buoyCheckStage(
      allFlagCols = Seq("tas_eraqc", "sfcWind_eraqc"),
      windFlagCols = Seq("sfcWind_eraqc")) +:
      QaqcPipeline.singleVariable("station", "time", "tas", lo = 210.15, hi = 329.92)

    val out = QaqcPipeline.run(rows, stages)
      .select("station", "time", "tas_eraqc", "sfcWind_eraqc")
      .collect().map(r => (r.getString(0), r.getTimestamp(1).toString) ->
        ((Option(r.get(2)), Option(r.get(3))))).toMap
    def at(st: String, t: String) = out((st, t + ".0"))

    // disestablishment cutoff: only rows past it get flag 2, both variables
    assert(at("MARITIME_PTAC1", "2022-02-01 00:00:00") == (None, None))
    assert(at("MARITIME_PTAC1", "2022-03-01 00:00:00") ==
      (Some(Flags.BuoyMissingPosition), Some(Flags.BuoyMissingPosition)))
    // adrift window: inside flagged, after the window clean
    assert(at("NDBC_46044", "2015-05-02 12:00:00") ==
      (Some(Flags.BuoyMissingPosition), Some(Flags.BuoyMissingPosition)))
    assert(at("NDBC_46044", "2015-06-01 00:00:00") == (None, None))
    // ferry hours: wind-only flag 1, daytime only
    assert(at("MARITIME_PTWW1", "2015-05-02 12:00:00") == (None, Some(Flags.BuoyDrift)))
    assert(at("MARITIME_PTWW1", "2015-05-02 03:00:00") == (None, None))
    // potential-issue station: whole record flag 2
    assert(at("NDBC_46290", "1995-01-01 00:00:00") ==
      (Some(Flags.BuoyMissingPosition), Some(Flags.BuoyMissingPosition)))
    // SAME timestamps at a non-maritime station: untouched by the buoy stage
    assert(at("CIMIS_2", "2022-03-01 00:00:00") == (None, None))
    assert(at("CIMIS_2", "2015-05-02 12:00:00") == (None, None))
  }

  test("buoy stage respects existing red flags (validObs guard, GoldenFlagsSpec semantics)") {
    val rows = Seq(("MARITIME_PTAC1", ts("2022-03-01 00:00:00"), 1000.0))
      .toDF("station", "time", "tas")
      .withColumn("tas_eraqc", lit(Flags.WorldRecord).cast("int"))
    val out = QaqcPipeline.run(rows, Seq(QaqcPipeline.buoyCheckStage(
      allFlagCols = Seq("tas_eraqc"), windFlagCols = Seq.empty)))
    assert(out.head().getAs[Int]("tas_eraqc") == Flags.WorldRecord)
  }
}
