package graft.sources

import graft.SparkSpec

class IsdParserSpec extends SparkSpec {
  import spark.implicits._

  /** Build a synthetic ISD line with known values at the reference's positions
    * (`ASOSAWOS_clean.py:254-580`). */
  private def isdLine(time: String = "202401151230", lat: String = "+34123",
                      lon: String = "-118456", elev: String = "+0123",
                      windDir: String = "270", wind: String = "0051",
                      tas: String = "+0215", tdps: String = "+0107",
                      psl: String = "10132", extra: String = ""): String = {
    val sb = new StringBuilder("0" * 105)
    def put(at: Int, s: String): Unit = sb.replace(at, at + s.length, s)
    put(15, time); put(28, lat); put(34, lon); put(46, elev)
    put(56, "V020"); put(60, windDir); put(63, "1"); put(64, "N"); put(65, wind); put(69, "1")
    put(87, tas); put(92, "1"); put(93, tdps); put(98, "1"); put(99, psl); put(104, "1")
    sb.toString + extra
  }

  test("parses mandatory section fields at reference positions") {
    val df = Seq(isdLine()).toDF("value")
    val r = IsdParser.parse(df).head()
    assert(r.getAs[java.sql.Timestamp]("time").toString.startsWith("2024-01-15 12:30"))
    assert(approx(r.getAs[Double]("lat"), 34.123))
    assert(approx(r.getAs[Double]("lon"), -118.456))
    assert(approx(r.getAs[Double]("elevation"), 123.0))
    assert(approx(r.getAs[Double]("sfcWind_dir"), 270.0))
    assert(approx(r.getAs[Double]("sfcWind"), 5.1))
    assert(approx(r.getAs[Double]("tas"), 21.5))
    assert(approx(r.getAs[Double]("tdps"), 10.7))
    assert(approx(r.getAs[Double]("psl"), 1013.2))
    assert(r.getAs[String]("tas_qc") == "1")
  }

  test("all-9 sentinels become null") {
    val df = Seq(isdLine(wind = "9999", tas = "+9999", psl = "99999", windDir = "999"))
      .toDF("value")
    val r = IsdParser.parse(df).head()
    assert(r.isNullAt(r.fieldIndex("sfcWind")))
    assert(r.isNullAt(r.fieldIndex("tas")))
    assert(r.isNullAt(r.fieldIndex("psl")))
    assert(r.isNullAt(r.fieldIndex("sfcWind_dir")))
  }

  test("AA1 precipitation section extracted when present") {
    val df = Seq(isdLine(extra = "ADDAA101001523"), isdLine()).toDF("value")
    val rows = IsdParser.parse(df).collect()
    val withPr = rows(0)
    assert(withPr.getAs[Int]("pr_duration") == 1)
    assert(approx(withPr.getAs[Double]("pr"), 0.15 * 10)) // "0015"/10 = 1.5 mm
    assert(rows(1).isNullAt(rows(1).fieldIndex("pr")))
  }

  test("AA1 9999-depth falls back to the second precip report (reference :356-379)") {
    // first report "019999xx" has the missing-depth sentinel; the 16-char read
    // exposes the second report "03002315" -> duration 03, depth 2.3 mm, qc "1","5"
    val df = Seq(isdLine(extra = "ADDAA101999912" + "03002315"),
      isdLine(extra = "ADDAA101999912")).toDF("value")
    val rows = IsdParser.parse(df).collect()
    val fb = rows(0)
    assert(fb.getAs[Int]("pr_duration") == 3)
    assert(approx(fb.getAs[Double]("pr"), 2.3))
    assert(fb.getAs[String]("pr_depth_qc") == "1")
    assert(fb.getAs[String]("pr_qc") == "5")
    // no second report -> pr stays null, first report's qc kept
    assert(rows(1).isNullAt(rows(1).fieldIndex("pr")))
    assert(rows(1).getAs[String]("pr_depth_qc") == "1")
  }

  test("CH2 humidity section parses like CH1 with qc/flag fields") {
    // 15 chars after CH2 (alnum only — the reference regex excludes '+'):
    // dur "60", temp "00215" qc "1" flag "0", hurs "0755" qc "1" flag "0"
    val df = Seq(isdLine(extra = "ADDCH2600021510075510")).toDF("value")
    val r = IsdParser.parse(df).head()
    assert(r.getAs[Int]("hurs_duration") == 60)
    assert(approx(r.getAs[Double]("hurs_temp"), 21.5))
    assert(r.getAs[String]("hurs_temp_qc") == "1")
    assert(approx(r.getAs[Double]("hurs"), 75.5))
    assert(r.getAs[String]("hurs_qc") == "1")
  }

  test("GM1 solar and MA1 pressure sections extracted when present") {
    // GM1 "00600450051": 0060 min, 0450 W/m2, flag "05", qc "1";
    // MA1 "101395101251": altimeter 10139/10 qc "5", station 10125/10 qc "1"
    val df = Seq(isdLine(extra = "ADDGM100600450051MA1101395101251"), isdLine())
      .toDF("value")
    val rows = IsdParser.parse(df).collect()
    val r = rows(0)
    assert(r.getAs[Int]("rsds_duration") == 60)
    assert(approx(r.getAs[Double]("rsds"), 450.0))
    assert(approx(r.getAs[Double]("ps_altimeter"), 1013.9))
    assert(approx(r.getAs[Double]("ps"), 1012.5))
    assert(r.getAs[String]("ps_qc") == "1")
    assert(rows(1).isNullAt(rows(1).fieldIndex("rsds")))
    assert(rows(1).isNullAt(rows(1).fieldIndex("ps")))
  }

  test("MA1 pressure sentinel 99999 becomes null") {
    val df = Seq(isdLine(extra = "MA1999999101251")).toDF("value")
    val r = IsdParser.parse(df).head()
    assert(r.isNullAt(r.fieldIndex("ps_altimeter")))
    assert(approx(r.getAs[Double]("ps"), 1012.5))
  }

  test("parse is a pure projection (row count preserved, scan-speed shape)") {
    val df = (1 to 100).map(_ => isdLine()).toDF("value")
    assert(IsdParser.parse(df).count() == 100)
  }
}
