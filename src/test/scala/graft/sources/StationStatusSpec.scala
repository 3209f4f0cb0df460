package graft.sources

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Pins `StationStatus.updateStationList` against the reference semantics of
  * `stnlist_update_clean.py:152-330` (clean_qa): Y/N status from the full-outer
  * merge, unlisted-cleaned append, bare-id substring error attach with
  * last-match-wins, clean-time gating, and the 1-vs-many error formats. */
class StationStatusSpec extends SparkSpec {

  private def ts(s: String) = Timestamp.valueOf(s)

  test("cleaned status, unlisted append, error attach/gating/formatting") {
    import spark.implicits._
    val stations = Seq("NET_1", "NET_12", "NET_2").toDF("era_id")
    // NET_7 is cleaned but not in the station list -> appended with Y (:267-279)
    val cleaned = Seq(
      ("NET_12", ts("2021-01-10 00:00:00")),
      ("NET_2", ts("2021-06-01 00:00:00")),
      ("NET_7", ts("2021-03-01 00:00:00"))).toDF("id", "time_cleaned")
    val errors = Seq(
      // matches bares {1, 12, 2}; last match = greatest era_id = NET_2; its
      // clean time (06-01) gates this March error OUT (:300-313)
      ("raw_12_x.csv", ts("2021-03-15 00:00:00"), "parse fail"),
      // matches only bare 7 (appended station) and survives its gate
      ("raw_7_x.csv", ts("2021-03-02 00:00:00"), "bad units"),
      // two surviving errors on NET_7 -> "file: error" pairs joined (:315-321)
      ("raw_7_y.csv", null.asInstanceOf[Timestamp], "io error"),
      // duplicate (file, error) row dropped (:145-146)
      ("raw_7_y.csv", null.asInstanceOf[Timestamp], "io error"),
      // whole-network rows dropped (:148)
      ("Whole network", ts("2021-01-01 00:00:00"), "listing fail"))
      .toDF("file", "time", "error")

    val got = StationStatus.updateStationList(stations, cleaned, errors)
      .orderBy("era_id").collect()

    assert(got.map(_.getAs[String]("era_id")).toSeq ==
      Seq("NET_1", "NET_12", "NET_2", "NET_7"))
    assert(got.map(_.getAs[String]("cleaned")).toSeq == Seq("N", "Y", "Y", "Y"))
    // the ambiguous raw_12 error went to NET_2 (last match) and was then
    // time-gated away -> nobody reports it; NET_12 must NOT have inherited it
    assert(got.filter(_.getAs[String]("errors_str") != null)
      .map(_.getAs[String]("era_id")).toSeq == Seq("NET_7"))
    val e7 = got.find(_.getAs[String]("era_id") == "NET_7").get
    assert(e7.getAs[String]("errors_str") ==
      "raw_7_x.csv: bad units raw_7_y.csv: io error")
  }

  test("single error reports its text verbatim; uncleaned keeps all errors") {
    import spark.implicits._
    val stations = Seq("NET_5").toDF("era_id")
    val cleaned = Seq.empty[(String, Timestamp)].toDF("id", "time_cleaned")
    val errors = Seq(("raw_5_x.csv", ts("2020-01-01 00:00:00"), "oops"))
      .toDF("file", "time", "error")
    val got = StationStatus.updateStationList(stations, cleaned, errors).collect()
    assert(got.length == 1)
    assert(got.head.getAs[String]("cleaned") == "N")
    // uncleaned (null time_cleaned) keeps the error; single error is verbatim
    assert(got.head.getAs[String]("errors_str") == "oops")
  }
}
