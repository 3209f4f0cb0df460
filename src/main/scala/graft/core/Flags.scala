package graft.core

/** ERA QA/QC flag vocabulary — integer codes 1–38, null = clean.
  *
  * Mirrors the reference's flag taxonomy
  * (`/root/reference/data/era_qaqc_flag_meanings.csv:1-39`); each code is set into a
  * per-variable `<var>_eraqc` IntegerType column (nullable, null = unflagged), the Spark
  * equivalent of the reference's NaN-filled float shadow columns
  * (`/root/reference/scripts/3_qaqc_data/QAQC_pipeline.py:434-457`).
  */
object Flags {
  val BuoyDrift = 1
  val BuoyMissingPosition = 2
  val ElevInfillDem = 3
  val ElevInfillNeighbor = 4
  val ElevInfillFailed = 5
  // 6-9: sensor-height gates — defined but NOT CALLED in the reference's v2 stage
  // list (many networks don't report heights, `qaqc_wholestation.py:596,633`);
  // implemented in CleanOps.sensorHeightFlags behind a default-off stage
  val ThermometerHeightMissing = 6
  val ThermometerHeightNot2m = 7
  val AnemometerHeightMissing = 8
  val AnemometerHeightNot10m = 9
  val NegativePrecip = 10
  val WorldRecord = 11
  val Supersaturation = 12
  val DewpointDepression24h = 13
  val CalmWindBadDir = 14
  val CalmWindZeroDir = 15
  val PrecipAccumWindowA = 16
  val PrecipAccumWindowB = 17
  val PrecipAccumWindowC = 18
  val ShortRecordStation = 19 // "yellow": kept unless kind="drop"
  val ShortRecordVariable = 20 // "yellow"
  val DistributionGapMonth = 21
  val DistributionGap = 22
  val Spike = 23
  val FrequentValue = 24
  val FrequentValuePrecip = 25
  val ClimatologicalOutlier = 26
  // Code assignment follows the reference CODE (qaqc_unusual_streaks.py:385,410,433),
  // which is normative over the CSV prose: 27 = same-hour repeats, 28 = straight
  // repeats, 29 = whole-day replication.
  val HourRepeatStreak = 27
  val StraightStreak = 28
  val DayRepeatStreak = 29
  val ValleywaterInfill = 30
  val PrecipDailyFrequent = 31
  val PrecipDailyOutlier = 32
  val PrecipDailyGap = 33
  // 34 = ambiguous oscillation in the ACCUMULATED series (deacc value nulled);
  // 35 = whole-column provenance marker on accum_<var> ("deaccumulation applied")
  val DeaccumAmbiguous = 34
  val DeaccumProvenance = 35
  val ElevInconsistent = 36
  val ValleywaterLonePeak = 37 // catalogued only; no implementation in reference
  val DerivedSynergistic = 38

  /** Yellow flags: excluded from "valid obs" only when kind="drop"
    * (`/root/reference/scripts/3_qaqc_data/qaqc_utils.py:326-378`). */
  val Yellow: Seq[Int] = Seq(ShortRecordStation, ShortRecordVariable)
}
