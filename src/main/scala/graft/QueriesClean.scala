package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.{NetworkCatalogs, StationStatus}

/** Batch C2 query instantiations — per-network clean catalogs (SURVEY §2.1 S4,
  * data half): the CIMIS / SCAN-SNOTEL / CW3E / VALLEYWATER / MARITIME / MADIS
  * standardization plans plus the ISD fixed-width clean (c13) and the
  * clean/qaqc-stage station ledgers (s12/s13), each run over raw-shaped
  * projections of `events` and oracle-checked end-to-end (local-time convention
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
    }),

    // CW3E (`CW3E_clean.py:57-635`): `%Y.%j.%H%M` time reassembly from the
    // year / julian-day / HHMM columns (already UTC), −99999 NA/sentinel,
    // °C -> K, mb -> Pa. Values ride a double->string->double round trip
    // (Java shortest-repr strings round-trip exactly) — the raw files are
    // stringly typed and the catalog's parse path is the system under test.
    "c9_cw3e_clean" -> ((s, dir) => {
      val e = t(s, dir, "events")
      val tm = date_trunc("MINUTE", expr("ts - INTERVAL 10 YEARS"))
      val raw = e.select(
        col("user_id"),
        year(tm).cast("string").as("Year (end time of average)"),
        dayofyear(tm).cast("string").as("Julian Day (end time of average)"),
        (hour(tm) * 100 + minute(tm)).cast("string")
          .as("HoursMinutes (end time of average)"),
        when(col("event_id") % 97 === 0, lit("-99999"))
          .otherwise((col("value") / 10).cast("string")).as("Temperature (C)"),
        (lit(950.0) + col("value") / 100).cast("string").as("Pressure (mb)"))
        // same optimizer-barrier rationale as c7: the fixture ENCODE is not the
        // system under test; persisting stands in for "the raw file exists"
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      NetworkCatalogs.standardize(raw, NetworkCatalogs.cw3e,
          NetworkCatalogs.cw3e.stationId(concat(lit("S"), col("user_id").cast("string"))),
          NetworkCatalogs.cw3eTime(col("Year (end time of average)"),
            col("Julian Day (end time of average)"),
            col("HoursMinutes (end time of average)")))
        .select(col("station"), unix_timestamp(col("time")).as("time_s"),
          r4(col("tas")).as("tas"), r4(col("psl")).as("psl"))
    }),

    // VALLEYWATER (`VALLEYWATER_clean.py:45-278`): approval-null row drop,
    // 15-min grid infill with traceable flag 30 (the oracle-green c30 op),
    // inches -> mm into pr_15min, approval kept as raw_qc. The encode keys
    // everything off the 15-min bucket so raw rows are grid-aligned and
    // deterministic per (station, bucket) — exactly the raw-file shape.
    "c10_valleywater_clean" -> ((s, dir) => {
      val e = t(s, dir, "events")
      val raw0 = e.select(col("user_id"),
        floor(unix_timestamp(expr("ts - INTERVAL 10 YEARS")) / 900).as("b")).distinct()
      val t15 = timestamp_seconds(col("b") * 900)
      val raw = raw0.select(
        col("user_id"),
        date_format(t15, "yyyy-MM-dd HH:mm:ss").as("ISO 8601 UTC"),
        (pmod(col("b"), lit(1000)) / 100).cast("string").as("Value"),
        when(pmod(col("b") + col("user_id"), lit(89)) === 0, "")
          .when(pmod(col("b"), lit(2)) === 0, "1").otherwise("2").as("Approval Level"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      NetworkCatalogs.standardizeValleywater(raw,
          concat(lit("VALLEYWATER_"), col("user_id").cast("string")))
        .select(col("station"), unix_timestamp(col("time")).as("time_s"),
          r4(col("pr_15min")).as("pr_15min"), col("raw_qc"),
          col("pr_15min_eraqc").as("infill_flag"))
    }),

    // MARITIME/NDBC (`MARITIME_clean.py:160-660`): Y/M/D/h/m time reassembly
    // (already UTC), `MM` NA token, 999/99/9999 missing codes, hPa -> Pa,
    // °C -> K on air temperature.
    "c11_maritime_clean" -> ((s, dir) => {
      val e = t(s, dir, "events")
      val tm = date_trunc("MINUTE", expr("ts - INTERVAL 10 YEARS"))
      val raw = e.select(
        col("user_id"),
        year(tm).cast("string").as("YYYY"),
        month(tm).cast("string").as("MO"),
        dayofmonth(tm).cast("string").as("DD"),
        hour(tm).cast("string").as("hh"),
        minute(tm).cast("string").as("mi"),
        when(col("event_id") % 97 === 0, lit("MM"))
          .otherwise((col("value") / 20).cast("string")).as("ATMP"),
        when(col("event_id") % 89 === 0, lit("999"))
          .otherwise((lit(950.0) + col("value") / 100).cast("string")).as("PRES"),
        (col("value") / 50).cast("string").as("WSPD"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      NetworkCatalogs.standardize(raw, NetworkCatalogs.maritime,
          NetworkCatalogs.maritime.stationId(col("user_id")),
          NetworkCatalogs.maritimeTime(raw))
        .select(col("station"), unix_timestamp(col("time")).as("time_s"),
          r4(col("tas")).as("tas"), r4(col("ps")).as("ps"),
          r4(col("sfcWind")).as("sfcWind"))
    }),

    // MADIS/CWOP (`MADIS_clean.py:404-1702`): Synoptic `<var>_set_1` columns with
    // `;`-separated float-coerced QC flags (".0" residue stripped — `:650-662`),
    // "None" NA token, °C -> K on temperatures, pressure already Pa, wind m/s.
    // The raw-file PARSE path (header sniff, per-file dynamic columns, duplicate
    // columns, first-data-row scan) is pinned by NetworkCatalogsSpec's MADIS file
    // fixture; this query starts from the parsed raw shape, like c7-c11.
    "c12_madis_clean" -> ((s, dir) => {
      val e = t(s, dir, "events")
      val tm = date_trunc("SECOND", expr("ts - INTERVAL 10 YEARS"))
      val raw = e.select(
        concat(lit("AP"), col("user_id").cast("string")).as("Station_ID"),
        date_format(tm, "yyyy-MM-dd HH:mm:ss").as("Date_Time"),
        when(col("event_id") % 97 === 0, lit("None"))
          .otherwise((col("value") / 10).cast("string")).as("air_temp_set_1"),
        when(col("value") > 450, lit("2.0;3.0"))
          .when(col("value") > 400, lit("2.0")).as("air_temp_set_1_qc"),
        (lit(96000.0) + col("value") * 10).cast("string").as("pressure_set_1"),
        (col("value") / 50).cast("string").as("wind_speed_set_1"))
        // same optimizer-barrier rationale as c7: the fixture ENCODE is not the
        // system under test; persisting stands in for "the raw file exists"
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      NetworkCatalogs.standardize(raw, NetworkCatalogs.madis,
          NetworkCatalogs.madis.stationId(col("Station_ID")),
          to_timestamp(col("Date_Time")))
        .select(col("station"), unix_timestamp(col("time")).as("time_s"),
          r4(col("tas")).as("tas"), col("tas_qc"), r4(col("ps")).as("ps"),
          r4(col("sfcWind")).as("sfcWind"))
    }),

    // ASOSAWOS/OtherISD (`ASOSAWOS_clean.py:254-580`, `OtherISD_clean.py:70-1019`):
    // fixed-width ISD records encoded from events (mandatory section + optional
    // MA1 pressure / AA1 precip), parsed by IsdParser at scan speed, then the
    // clean-stage unit conversions (°C -> K, hPa -> Pa) + platform time filter.
    "c13_asos_clean" -> ((s, dir) => {
      val e = t(s, dir, "events")
      val tm = date_trunc("MINUTE", expr("ts - INTERVAL 10 YEARS"))
      val d = abs(round(col("value"))).cast("int") // deci-units payload
      val line = concat(
        lit("0123"),                                      // [0:4] record length etc.
        lpad(col("user_id").cast("string"), 11, "0"),     // [4:15] USAF+WBAN
        date_format(tm, "yyyyMMddHHmm"),                  // [15:27]
        lit("4"),                                         // [27] source
        lit("+37123"), lit("-121456"),                    // [28:41] lat/lon
        lit("00000"),                                     // [41:46] type code
        lit("+0030"),                                     // [46:51] elevation
        lit("00000"),                                     // [51:56] call letters
        lit("V020"),                                      // [56:60] qaqc process
        lit("999"), lit("9"), lit("N"),                   // [60:65] wind dir missing
        lpad(d.cast("string"), 4, "0"), lit("1"),         // [65:70] wind speed
        lit("00000000000000000"),                         // [70:87] sky/visibility
        concat(lit("+"), lpad(d.cast("string"), 4, "0")), lit("1"), // [87:93] tas
        lit("+9999"), lit("9"),                           // [93:99] tdps missing
        lpad((lit(95000) + d).cast("string"), 5, "0"), lit("1"),    // [99:105] psl
        when(col("event_id") % 3 === 0,
          concat(lit("MA1"), lpad((lit(10000) + d).cast("string"), 5, "0"), lit("5"),
            lpad((lit(9000) + d).cast("string"), 5, "0"), lit("5"))).otherwise(lit("")),
        when(col("event_id") % 5 === 0,
          concat(lit("AA101"), lpad(d.cast("string"), 4, "0"), lit("05"))).otherwise(lit("")))
      val lines = e.select(line.as("value"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      graft.sources.IsdParser.parse(lines)
        .filter(col("time") > lit("1979-12-31 00:00:00").cast("timestamp") &&
          col("time") < lit("2022-09-01 00:00:00").cast("timestamp"))
        .select(
          concat(lit("ASOSAWOS_"), col("usaf"), col("wban")).as("station"),
          unix_timestamp(col("time")).as("time_s"),
          r4(col("tas") + 273.15).as("tas"),
          r4(col("psl") * 100).as("psl"),
          r4(col("ps") * 100).as("ps"),
          r4(col("pr")).as("pr"),
          r4(col("sfcWind")).as("sfcWind"))
    }),

    // Clean-stage bookkeeping (`stnlist_update_clean.py:152-330`): cleaned Y/N via
    // full-outer merge (unlisted cleaned stations appended), bare-id substring
    // error attach with last-match-wins, clean-time gating, multi-error concat.
    // The fixture exercises every branch: uid%29==0 stations are unlisted,
    // uid%3==0 are uncleaned, single-digit bare ids force ambiguous substring
    // matches resolved by the last-match rule.
    "s12_stnlist_status" -> ((s, dir) => {
      val e = t(s, dir, "events")
      val stations = e.filter(col("user_id") % 29 =!= 0)
        .select(concat(lit("NET_"), col("user_id").cast("string")).as("era_id"))
        .distinct()
      val cleanedIds = e.filter(col("user_id") % 3 =!= 0)
        .groupBy(col("user_id"))
        .agg(date_trunc("SECOND", min(col("ts"))).as("time_cleaned"))
        .select(concat(lit("NET_"), col("user_id").cast("string")).as("id"),
          col("time_cleaned"))
      val errors = e.filter(col("event_id") % 101 === 0)
        .groupBy(col("user_id"), col("event_type"))
        .agg(date_trunc("SECOND", min(col("ts"))).as("time"))
        .select(concat(lit("raw_"), col("user_id").cast("string"), lit("_x.csv")).as("file"),
          col("time"), col("event_type").as("error"))
      StationStatus.updateStationList(stations, cleanedIds, errors)
        .select(col("era_id"), col("cleaned"),
          unix_timestamp(col("time_cleaned")).as("tc_s"), col("errors_str"))
    }),

    // QAQC-stage ledger (`stnlist_update_qaqc.py:1-380`): same shape as s12 with
    // the stage deltas — `_c` concatenated-station suffix normalized back to the
    // original id (uid%7==0 outputs carry it), and stage outputs missing from the
    // station list DROPPED instead of appended (uid%29==0 passed-ids are unlisted
    // and must not surface). The merge ledger shares this code path minus the `_c`
    // rule (StationStatusSpec pins it).
    "s13_stnlist_qaqc" -> ((s, dir) => {
      val e = t(s, dir, "events")
      val stations = e.filter(col("user_id") % 29 =!= 0)
        .select(concat(lit("NET_"), col("user_id").cast("string")).as("era_id"))
        .distinct()
      val passed = e.filter(col("user_id") % 3 =!= 0)
        .groupBy(col("user_id"))
        .agg(date_trunc("SECOND", min(col("ts"))).as("time_qaqc"))
        .select(concat(lit("NET_"), col("user_id").cast("string"),
          when(col("user_id") % 7 === 0, "_c").otherwise("")).as("id"),
          col("time_qaqc"))
      val errors = e.filter(col("event_id") % 101 === 0)
        .groupBy(col("user_id"), col("event_type"))
        .agg(date_trunc("SECOND", min(col("ts"))).as("time"))
        .select(concat(lit("raw_"), col("user_id").cast("string"), lit("_x.csv")).as("file"),
          col("time"), col("event_type").as("error"))
      StationStatus.updateStationListQaqc(stations, passed, errors)
        .select(col("era_id"), col("qaqc"),
          unix_timestamp(col("time_qaqc")).as("tq_s"), col("errors_str"))
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
         FROM std""",
    "c9_cw3e_clean" ->
      """WITH e AS (
           SELECT user_id, event_id, value,
                  date_trunc('minute', ts - INTERVAL 10 YEAR) AS tm
           FROM events),
         raw AS (
           SELECT 'CW3E_S' || CAST(user_id AS VARCHAR) AS station, tm,
                  CASE WHEN event_id % 97 = 0 THEN NULL ELSE value / 10 END AS tc,
                  950.0 + value / 100 AS pmb
           FROM e),
         std AS (
           SELECT DISTINCT station, tm,
                  tc + 273.15 AS tas, pmb * 100.0 AS psl
           FROM raw
           WHERE tm > TIMESTAMP '1979-12-31' AND tm < TIMESTAMP '2022-09-01')
         SELECT station, CAST(epoch(tm) AS BIGINT) AS time_s,
                ROUND(tas, 4) + 0 AS tas, ROUND(psl, 4) + 0 AS psl
         FROM std""",
    "c10_valleywater_clean" ->
      """WITH b0 AS (
           SELECT DISTINCT user_id,
                  CAST(floor(epoch(ts - INTERVAL 10 YEAR) / 900) AS BIGINT) AS b
           FROM events),
         raw AS (
           SELECT user_id, to_timestamp(b * 900) AS t15,
                  (b % 1000) / 100.0 AS vin,
                  CASE WHEN (b + user_id) % 89 = 0 THEN NULL
                       WHEN b % 2 = 0 THEN '1' ELSE '2' END AS apr
           FROM b0),
         kept AS (
           SELECT * FROM raw
           WHERE apr IS NOT NULL
             AND t15 > TIMESTAMP '1979-12-31' AND t15 < TIMESTAMP '2022-09-01'),
         grid AS (
           SELECT user_id,
                  unnest(generate_series(min(t15), max(t15), INTERVAL 15 MINUTE)) AS t15
           FROM kept GROUP BY user_id)
         SELECT 'VALLEYWATER_' || CAST(g.user_id AS VARCHAR) AS station,
                CAST(epoch(g.t15) AS BIGINT) AS time_s,
                ROUND(k.vin * 25.4, 4) + 0 AS pr_15min,
                k.apr AS raw_qc,
                CASE WHEN k.user_id IS NULL THEN 30 END AS infill_flag
         FROM grid g LEFT JOIN kept k
           ON g.user_id = k.user_id AND g.t15 = k.t15""",
    "c11_maritime_clean" ->
      """WITH e AS (
           SELECT user_id, event_id, value,
                  date_trunc('minute', ts - INTERVAL 10 YEAR) AS tm
           FROM events),
         raw AS (
           SELECT 'MARITIME_' || CAST(user_id AS VARCHAR) AS station, tm,
                  CASE WHEN event_id % 97 = 0 THEN NULL ELSE value / 20 END AS atmp,
                  CASE WHEN event_id % 89 = 0 THEN NULL
                       ELSE 950.0 + value / 100 END AS pres,
                  value / 50 AS wspd
           FROM e),
         std AS (
           SELECT DISTINCT station, tm,
                  atmp + 273.15 AS tas, pres * 100.0 AS ps, wspd AS sfcWind
           FROM raw
           WHERE tm > TIMESTAMP '1979-12-31' AND tm < TIMESTAMP '2022-09-01')
         SELECT station, CAST(epoch(tm) AS BIGINT) AS time_s,
                ROUND(tas, 4) + 0 AS tas, ROUND(ps, 4) + 0 AS ps,
                ROUND(sfcWind, 4) + 0 AS sfcWind
         FROM std""",
    "c12_madis_clean" ->
      """WITH e AS (
           SELECT user_id, event_id, value,
                  date_trunc('second', ts - INTERVAL 10 YEAR) AS tm
           FROM events),
         raw AS (
           SELECT 'MADIS_AP' || CAST(user_id AS VARCHAR) AS station, tm,
                  CASE WHEN event_id % 97 = 0 THEN NULL ELSE value / 10 END AS tc,
                  CASE WHEN value > 450 THEN '2;3'
                       WHEN value > 400 THEN '2' END AS qc,
                  96000.0 + value * 10 AS psv,
                  value / 50 AS wspd
           FROM e),
         std AS (
           SELECT DISTINCT station, tm,
                  tc + 273.15 AS tas, qc AS tas_qc, psv AS ps, wspd AS sfcWind
           FROM raw
           WHERE tm > TIMESTAMP '1979-12-31' AND tm < TIMESTAMP '2022-09-01')
         SELECT station, CAST(epoch(tm) AS BIGINT) AS time_s,
                ROUND(tas, 4) + 0 AS tas, tas_qc, ROUND(ps, 4) + 0 AS ps,
                ROUND(sfcWind, 4) + 0 AS sfcWind
         FROM std""",
    "c13_asos_clean" ->
      """WITH e AS (
           SELECT user_id, event_id,
                  CAST(abs(round(value)) AS BIGINT) AS d,
                  date_trunc('minute', ts - INTERVAL 10 YEAR) AS tm
           FROM events),
         parsed AS (
           SELECT 'ASOSAWOS_' || lpad(CAST(user_id AS VARCHAR), 11, '0') AS station,
                  tm,
                  d / 10.0 + 273.15 AS tas,
                  (95000 + d) * 10.0 AS psl,
                  CASE WHEN event_id % 3 = 0 THEN (9000 + d) * 10.0 END AS ps,
                  CASE WHEN event_id % 5 = 0 THEN d / 10.0 END AS pr,
                  d / 10.0 AS sfcWind
           FROM e
           WHERE tm > TIMESTAMP '1979-12-31' AND tm < TIMESTAMP '2022-09-01')
         SELECT station, CAST(epoch(tm) AS BIGINT) AS time_s,
                ROUND(tas, 4) + 0 AS tas, ROUND(psl, 4) + 0 AS psl,
                ROUND(ps, 4) + 0 AS ps, ROUND(pr, 4) + 0 AS pr,
                ROUND(sfcWind, 4) + 0 AS sfcWind
         FROM parsed""",
    "s13_stnlist_qaqc" ->
      """WITH st AS (
           SELECT DISTINCT 'NET_' || CAST(user_id AS VARCHAR) AS era_id
           FROM events WHERE user_id % 29 <> 0),
         cl AS (
           SELECT 'NET_' || CAST(user_id AS VARCHAR) AS id,
                  date_trunc('second', min(ts)) AS time_qaqc
           FROM events WHERE user_id % 3 <> 0 GROUP BY user_id),
         er AS (
           SELECT 'raw_' || CAST(user_id AS VARCHAR) || '_x.csv' AS file,
                  date_trunc('second', min(ts)) AS time, event_type AS error
           FROM events WHERE event_id % 101 = 0 GROUP BY user_id, event_type),
         base AS (
           SELECT st.era_id,
                  CASE WHEN cl.id IS NULL THEN 'N' ELSE 'Y' END AS qaqc,
                  cl.time_qaqc
           FROM st LEFT JOIN cl ON st.era_id = cl.id),
         cand AS (
           SELECT er.file, er.error, er.time, b.era_id AS m_era_id,
                  b.time_qaqc AS m_tq,
                  row_number() OVER (PARTITION BY er.file, er.error
                                     ORDER BY b.era_id DESC) AS rn
           FROM er JOIN base b
             ON er.file LIKE '%' || regexp_extract(b.era_id, '([^_]+)$', 1) || '%'),
         att AS (
           SELECT * FROM cand
           WHERE rn = 1 AND (m_tq IS NULL OR time IS NULL OR time >= m_tq)),
         per AS (
           SELECT m_era_id AS era_id,
                  CASE WHEN COUNT(*) = 1 THEN MIN(error)
                       ELSE string_agg(file || ': ' || error, ' '
                                       ORDER BY file, error) END AS errors_str
           FROM att GROUP BY m_era_id)
         SELECT b.era_id, b.qaqc,
                CAST(epoch(b.time_qaqc) AS BIGINT) AS tq_s, p.errors_str
         FROM base b LEFT JOIN per p USING (era_id)""",
    "s12_stnlist_status" ->
      """WITH st AS (
           SELECT DISTINCT 'NET_' || CAST(user_id AS VARCHAR) AS era_id
           FROM events WHERE user_id % 29 <> 0),
         cl AS (
           SELECT 'NET_' || CAST(user_id AS VARCHAR) AS id,
                  date_trunc('second', min(ts)) AS time_cleaned
           FROM events WHERE user_id % 3 <> 0 GROUP BY user_id),
         er AS (
           SELECT 'raw_' || CAST(user_id AS VARCHAR) || '_x.csv' AS file,
                  date_trunc('second', min(ts)) AS time, event_type AS error
           FROM events WHERE event_id % 101 = 0 GROUP BY user_id, event_type),
         base AS (
           SELECT COALESCE(st.era_id, cl.id) AS era_id,
                  CASE WHEN cl.id IS NULL THEN 'N' ELSE 'Y' END AS cleaned,
                  cl.time_cleaned
           FROM st FULL OUTER JOIN cl ON st.era_id = cl.id),
         cand AS (
           SELECT er.file, er.error, er.time, b.era_id AS m_era_id,
                  b.time_cleaned AS m_tc,
                  row_number() OVER (PARTITION BY er.file, er.error
                                     ORDER BY b.era_id DESC) AS rn
           FROM er JOIN base b
             ON er.file LIKE '%' || regexp_extract(b.era_id, '([^_]+)$', 1) || '%'),
         att AS (
           SELECT * FROM cand
           WHERE rn = 1 AND (m_tc IS NULL OR time IS NULL OR time >= m_tc)),
         per AS (
           SELECT m_era_id AS era_id,
                  CASE WHEN COUNT(*) = 1 THEN MIN(error)
                       ELSE string_agg(file || ': ' || error, ' '
                                       ORDER BY file, error) END AS errors_str
           FROM att GROUP BY m_era_id)
         SELECT b.era_id, b.cleaned,
                CAST(epoch(b.time_cleaned) AS BIGINT) AS tc_s, p.errors_str
         FROM base b LEFT JOIN per p USING (era_id)"""
  )
}
