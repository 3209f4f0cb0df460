package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** S2 — NOAA ISD fixed-width record parser
  * (`/root/reference/scripts/2_clean_data/ASOSAWOS_clean.py:254-580`; same layout in
  * `OtherISD_clean.py:70-1019`), re-expressed as a single `select` of
  * substring/regexp projections over `spark.read.text` lines: ~20 derived columns, all
  * codegen'd — the whole parse runs at scan speed with no per-record Python.
  *
  * Positions are the reference's (0-based python slices → 1-based SQL substr):
  * time [15:27] yyyyMMddHHmm, lat [28:34]/1000, lon [34:41]/1000, elev [46:51],
  * qaqc_process [56:60], wind dir [60:63] + qc [63], wind speed [65:69]/10 + qc [69],
  * tas [87:92]/10 + qc [92], tdps [93:98]/10 + qc [98], psl [99:104]/10 + qc [104].
  * Optional sections via regexp: AA1-4 liquid precip (duration hh, depth /10 mm,
  * depth-qc + qc, with the reference's second-report fallback when the first
  * depth is the 9999 sentinel — `ASOSAWOS_clean.py:335-379`), CH1/CH2 relative
  * humidity (duration min, temp /10 C + qc + flag, hurs /10 % + qc + flag,
  * `:388-412`), GM1 global irradiance (duration min, rsds W/m2, flag, qc —
  * `:415-436`), MA1 pressure (altimeter /10 hPa + qc, station /10 hPa + qc,
  * `:438-457`; 9999.9 hPa sentinel → null).
  *
  * Sentinel handling mirrors the reference: all-9 fields → null.
  */
object IsdParser {

  private def slice(c: Column, from0: Int, until0: Int): Column =
    substring(c, from0 + 1, until0 - from0)

  private def num(c: Column, sentinel: String): Column =
    when(c === sentinel, lit(null)).otherwise(c.cast("double"))

  def parse(lines: DataFrame, lineCol: String = "value"): DataFrame = {
    val s = col(lineCol)
    val precip = regexp_extract(s, "(?<=AA1|AA2|AA3|AA4)([0-9a-zA-Z]{8})", 1)
    // second liquid-precip report (`ASOSAWOS_clean.py:356-379`): when the first
    // report's depth is the 9999 sentinel, a 16-char read exposes the next AA
    // section's (duration, depth, qc) — used only if its duration digit is numeric
    val precip16 = regexp_extract(s, "(?<=AA1|AA2|AA3|AA4)([0-9a-zA-Z]{16})", 1)
    val firstMissing = precip =!= "" && substring(precip, 3, 4) === "9999"
    val fallback = firstMissing && precip16 =!= "" &&
      substring(precip16, 10, 1).rlike("[0-9]")
    val hursSec = regexp_extract(s, "(?<=CH1|CH2)([0-9a-zA-Z]{15})", 1)
    val rsdsSec = regexp_extract(s, "(?<=GM1)([0-9a-zA-Z]{11})", 1)
    val psSec = regexp_extract(s, "(?<=MA1)([0-9a-zA-Z]{12})", 1)
    lines.select(
      // control section station identifiers: USAF [4:10] + WBAN [10:15] — the
      // reference keys stations off the same ids via the file name
      // (`ASOSAWOS_clean.py:254-280`); parsing them keeps the id with the record
      slice(s, 4, 10).as("usaf"),
      slice(s, 10, 15).as("wban"),
      to_timestamp(slice(s, 15, 27), "yyyyMMddHHmm").as("time"),
      (num(slice(s, 28, 34), "+99999") / 1000).as("lat"),
      (num(slice(s, 34, 41), "+999999") / 1000).as("lon"),
      num(slice(s, 46, 51), "+9999").as("elevation"),
      slice(s, 56, 60).as("qaqc_process"),
      num(slice(s, 60, 63), "999").as("sfcWind_dir"),
      slice(s, 63, 64).as("sfcWind_dir_qc"),
      slice(s, 64, 65).as("sfcWind_method"),
      (num(slice(s, 65, 69), "9999") / 10).as("sfcWind"),
      slice(s, 69, 70).as("sfcWind_qc"),
      (num(slice(s, 87, 92), "+9999") / 10).as("tas"),
      slice(s, 92, 93).as("tas_qc"),
      (num(slice(s, 93, 98), "+9999") / 10).as("tdps"),
      slice(s, 98, 99).as("tdps_qc"),
      (num(slice(s, 99, 104), "99999") / 10).as("psl"),
      slice(s, 104, 105).as("psl_qc"),
      when(fallback, substring(precip16, 9, 2).cast("int"))
        .otherwise(when(precip =!= "", substring(precip, 1, 2).cast("int")))
        .as("pr_duration"),
      when(fallback, substring(precip16, 11, 4).cast("double") / 10)
        .otherwise(when(precip =!= "" && !firstMissing,
          substring(precip, 3, 4).cast("double") / 10))
        .as("pr"),
      when(fallback, substring(precip16, 15, 1))
        .otherwise(when(precip =!= "", substring(precip, 7, 1)))
        .as("pr_depth_qc"),
      when(fallback, substring(precip16, 16, 1))
        .otherwise(when(precip =!= "", substring(precip, 8, 1)))
        .as("pr_qc"),
      when(hursSec =!= "", substring(hursSec, 1, 2).cast("int")).as("hurs_duration"),
      when(hursSec =!= "", substring(hursSec, 3, 5).cast("double") / 10).as("hurs_temp"),
      when(hursSec =!= "", substring(hursSec, 8, 1)).as("hurs_temp_qc"),
      when(hursSec =!= "", substring(hursSec, 9, 1)).as("hurs_temp_flag"),
      when(hursSec =!= "", substring(hursSec, 10, 4).cast("double") / 10).as("hurs"),
      when(hursSec =!= "", substring(hursSec, 14, 1)).as("hurs_qc"),
      when(hursSec =!= "", substring(hursSec, 15, 1)).as("hurs_flag"),
      // GM1: [0:4] integration minutes, [4:8] W/m2, [8:10] flag, [10:12] qc
      when(rsdsSec =!= "", substring(rsdsSec, 1, 4).cast("int")).as("rsds_duration"),
      when(rsdsSec =!= "", substring(rsdsSec, 5, 4).cast("double")).as("rsds"),
      when(rsdsSec =!= "", substring(rsdsSec, 9, 2)).as("rsds_flag"),
      when(rsdsSec =!= "", substring(rsdsSec, 11, 1)).as("rsds_qc"),
      // MA1: [0:5]/10 altimeter hPa, [5] qc, [6:11]/10 station pressure hPa, [11] qc
      when(psSec =!= "" && substring(psSec, 1, 5) =!= "99999",
        substring(psSec, 1, 5).cast("double") / 10).as("ps_altimeter"),
      when(psSec =!= "", substring(psSec, 6, 1)).as("ps_altimeter_qc"),
      when(psSec =!= "" && substring(psSec, 7, 5) =!= "99999",
        substring(psSec, 7, 5).cast("double") / 10).as("ps"),
      when(psSec =!= "", substring(psSec, 12, 1)).as("ps_qc"))
  }
}
