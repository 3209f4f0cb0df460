package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.NetworkCatalogs

/** Batch C2 query instantiations — per-network clean catalogs (SURVEY §2.1 S4,
  * data half): the CIMIS and SCAN/SNOTEL standardization plans run over CSV-shaped
  * projections of `events`, oracle-checked end-to-end (local-time convention
  * inversion, sentinel/NA nulling, unit conversion, QC shadow columns, platform
  * time filter, exact-duplicate drop).
  *
  * Timestamps are shifted back 10 years (2024 → 2014 — events is all-January, so
  * no leap-day clamping) to land inside the reference's 1980–2022 window; the raw
  * file PARSE paths (positional schemas, NA tokens, filename ids) are pinned by
  * NetworkCatalogsSpec fixtures — oracle SQL can't read CSV, so the queries start
  * from the already-parsed raw shape, which is exactly what [[NetworkCatalogs
  * .standardize]] consumes. */
object QueriesClean {

  /** Scan-side repartition (same rationale as QueriesLlm's loader): the testdata
    * tables are single-row-group parquet, so the scan is ONE task — and the clean
    * queries do java.time-heavy per-row work that must not run single-threaded.
    * At production scale the file count already provides scan parallelism. */
  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    SparkEntry.loadTable(s, dir, name).repartition(s.sparkContext.defaultParallelism)

  private def r4(c: Column): Column = round(c, 4)

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // CIMIS (`CIMIS_clean.py:58-734`): 1–24h PST convention (2400 -> next-day
    // 00:00), +8 h to UTC, sentinel −9998 family -> null, °C -> K, QC shadow.
    // The Date/Hour columns are ENCODED as the raw files carry them (M/d/yyyy
    // string + HHMM int) and decoded by the catalog — the round trip is the test.
    "c7_cimis_clean" -> ((s, dir) => {
      val e = t(s, dir, "events")
      val pstHour = date_trunc("HOUR", expr("ts - INTERVAL 10 YEARS - INTERVAL 8 HOURS"))
      val h = hour(pstHour)
      val raw = e.select(
        col("user_id").cast("string").as("Station ID"),
        date_format(when(h === 0, date_sub(to_date(pstHour), 1))
          .otherwise(to_date(pstHour)), "MM/dd/yyyy").as("Date"),
        (when(h === 0, 24).otherwise(h) * 100).as("Hour (PST)"),
        // no projection-side rounding: value/10 sits on exact .005 ties where
        // HALF_UP (Spark) and DuckDB's double rounding diverge; the unrounded
        // double is bit-identical across engines and the output r4 has no ties
        when(col("event_id") % 97 === 0, -9998.0)
          .otherwise(col("value") / 10).as("Air Temperature (°C)"),
        when(col("value") > 400, "Y").as("QC for Air Temperature"))
        // the fixture ENCODE (events -> CIMIS-shaped strings) is not the system
        // under test — a real adopter reads raw CSV bytes. Persisting it stands
        // in for "the raw file exists" AND is the required optimizer barrier:
        // without it, predicate pushdown inlines the java.time decode chain into
        // the time-bounds filter TWICE and evaluates it inside the single
        // scan task (measured 2.7 s warm; with the barrier the decode runs at
        // full parallelism). Released by the harness clearCache (BASELINE.md
        // cache-release contract).
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      NetworkCatalogs.standardize(raw, NetworkCatalogs.cimis,
          NetworkCatalogs.cimis.stationId(col("Station ID")),
          NetworkCatalogs.cimisTime(col("Date"), col("Hour (PST)"), "MM/dd/yyyy"))
        .select(col("station"), unix_timestamp(col("time")).as("time_s"),
          r4(col("tas")).as("tas"), col("tas_qc"))
    }),

    // SCAN/SNOTEL (`SCANSNOTEL_clean.py:55-768`): per-station tz-offset shift to
    // UTC (broadcast metadata join in the read path; inline column here), °F -> K,
    // inHg -> Pa, `<VAR>_flag` QC shadow, dedup.
    "c8_scansnotel_clean" -> ((s, dir) => {
      val e = t(s, dir, "events")
      val tz = when(col("user_id") % 2 === 0, -8.0).otherwise(-7.0)
      // second-truncated: epoch output must be fraction-free (DuckDB CAST(epoch)
      // rounds, Spark unix_timestamp floors — micros would hash-mismatch)
      val localTs = date_trunc("SECOND", expr("ts - INTERVAL 10 YEARS")) +
        make_dt_interval(lit(0), lit(0), lit(0), tz * 3600.0)
      val raw = e.select(
        col("user_id"),
        tz.as("stationDataTimeZone"),
        localTs.as("time"),
        when(col("event_id") % 89 === 0, lit(null).cast("double"))
          .otherwise(col("value") / 5 + 32).as("TOBS_value"),
        when(col("value") > 450, "S").as("TOBS_flag"),
        (lit(29.0) + col("value") / 1000).as("PRES_value"))
      NetworkCatalogs.standardize(raw, NetworkCatalogs.scanSnotel,
          NetworkCatalogs.scanSnotel.stationId(col("user_id")),
          NetworkCatalogs.scanTime(col("time"), col("stationDataTimeZone")))
        .select(col("station"), unix_timestamp(col("time")).as("time_s"),
          r4(col("tas")).as("tas"), col("tas_qc"), r4(col("psl")).as("psl"))
    })
  )

  def oracles: Map[String, String] = Map(
    "c7_cimis_clean" ->
      """WITH e AS (
           SELECT user_id, event_id, value,
                  date_trunc('hour', ts - INTERVAL 10 YEAR - INTERVAL 8 HOUR) AS pst_h
           FROM events),
         raw AS (
           SELECT CAST(user_id AS VARCHAR) AS sid, pst_h,
                  CASE WHEN event_id % 97 = 0 THEN -9998.0
                       ELSE value / 10 END AS tc,
                  CASE WHEN value > 400 THEN 'Y' END AS qc
           FROM e),
         std AS (
           SELECT DISTINCT 'CIMIS_' || sid AS station,
                  pst_h + INTERVAL 8 HOUR AS time_utc,
                  CASE WHEN tc IN (-9998.0, -9997.0, -6999.0, 6999.0, -8484.0)
                       THEN NULL ELSE tc + 273.15 END AS tas,
                  qc AS tas_qc
           FROM raw
           WHERE pst_h + INTERVAL 8 HOUR > TIMESTAMP '1979-12-31'
             AND pst_h + INTERVAL 8 HOUR < TIMESTAMP '2022-09-01')
         SELECT station, CAST(epoch(time_utc) AS BIGINT) AS time_s,
                ROUND(tas, 4) + 0 AS tas, tas_qc
         FROM std""",
    "c8_scansnotel_clean" ->
      """WITH raw AS (
           SELECT user_id,
                  date_trunc('second', ts - INTERVAL 10 YEAR) AS time_utc,
                  CASE WHEN event_id % 89 = 0 THEN NULL
                       ELSE value / 5 + 32 END AS tf,
                  CASE WHEN value > 450 THEN 'S' END AS fl,
                  29.0 + value / 1000 AS pres
           FROM events),
         std AS (
           SELECT DISTINCT 'SCANSNOTEL_' || CAST(user_id AS VARCHAR) AS station,
                  time_utc,
                  (tf - 32.0) * (5.0 / 9.0) + 273.15 AS tas,
                  fl AS tas_qc,
                  pres * 3386.39 AS psl
           FROM raw
           WHERE time_utc > TIMESTAMP '1979-12-31'
             AND time_utc < TIMESTAMP '2022-09-01')
         SELECT station, CAST(epoch(time_utc) AS BIGINT) AS time_s,
                ROUND(tas, 4) + 0 AS tas, tas_qc, ROUND(psl, 4) + 0 AS psl
         FROM std"""
  )
}
