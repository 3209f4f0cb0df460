package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.ops._

/** Batch A query instantiations — one per implemented-but-previously-untested operator
  * (SURVEY.md §2), each over the driver test tables with an exact DuckDB oracle in
  * [[QueriesCore.oracles]]. Numeric-parity conventions follow SparkEntry's scaladoc. */
object QueriesCore {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    SparkEntry.loadTable(s, dir, name)

  private def dsum(c: Column): Column = sum(c.cast("decimal(18,2)")).cast("double")
  private def r4(c: Column): Column = round(c, 4)

  /** Synthetic per-row QC flag for the flag-aware ops (11 = red, 19 = yellow). */
  private def synthFlag: Column =
    when(col("value") > 400, 11).when(col("value") < 1, 19).otherwise(lit(null)).cast("int")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // P1: sentinel standardization on rounded values (SURVEY §2.2 P1)
    "p1_sentinels" -> ((s, dir) => {
      val e = t(s, dir, "events").withColumn("v", round(col("value"), 0))
      CleanOps.nullSentinels(e, Map("v" -> Seq(42.0, 100.0)))
        .groupBy(col("event_type"))
        .agg(count(col("v")).as("n_valid"), count(lit(1)).as("n"))
    }),

    // P3: bounding-box filter (SURVEY §2.2 P3)
    "p3_bbox" -> ((s, dir) => {
      CleanOps.bboxFilter(t(s, dir, "supplier"), "s_acctbal", "s_nationkey",
          1000.0, 4000.0, 5.0, 20.0)
        .agg(count(lit(1)).as("n"), dsum(col("s_acctbal")).as("total_bal"))
    }),

    // P4: point-in-polygon membership (ray-casting UDF after bbox prefilter) over a
    // triangle whose edges avoid the integer y-grid, so boundary semantics never
    // differ between ray casting and the oracle's half-plane tests (SURVEY §2.2 P4)
    "p4_polygon" -> ((s, dir) => {
      val sup = t(s, dir, "supplier").withColumn("x", col("s_acctbal") / 1000.0)
      val tri = Seq((0.0, -0.5), (6.0, -0.5), (6.0, 24.5))
      CleanOps.filterInPolygon(sup, "x", "s_nationkey", tri)
        .agg(count(lit(1)).as("n"), dsum(col("s_acctbal")).as("total_bal"))
    }),

    // J2: broadcast sensor-metadata join (SURVEY §2.3 J2)
    "j2_metadata_join" -> ((s, dir) => {
      val nations = t(s, dir, "nation")
        .select(col("n_nationkey").as("s_nationkey"), col("n_name"))
      JoinOps.joinMetadata(t(s, dir, "supplier"), nations, Seq("s_nationkey"))
        .groupBy(col("n_name")).agg(count(lit(1)).as("n"), dsum(col("s_acctbal")).as("bal"))
    }),

    // Flags 3/4/5: elevation infill with a broadcast DEM table (SURVEY §2 A-gates)
    "c3_elev_infill" -> ((s, dir) => {
      val e = t(s, dir, "events")
        .withColumn("elev",
          when(col("value") < 400, lit(null)).otherwise(col("value")))
        .withColumn("elev_eraqc", lit(null).cast("int"))
      // DEM rows only for even user ids: odd all-null stations exercise the 0.0/5 path
      val dem = t(s, dir, "events").select(col("user_id")).distinct()
        .filter(col("user_id") % 2 === 0)
        .withColumn("dem_elev", col("user_id").cast("double") * 10)
      CleanOps.elevInfill(e, Seq("user_id"), "ts", "elev", "elev_eraqc", dem)
        .groupBy(col("elev_eraqc").cast("long").as("flag"))
        .agg(count(lit(1)).as("n"),
          sum(round(col("elev"), 2).cast("decimal(18,2)")).cast("double").as("total_elev"))
    }),

    // Flag 30: fixed-cadence (15 min) grid infill with traceable flag
    // (`VALLEYWATER_clean.py:117-134`)
    "c30_cadence_infill" -> ((s, dir) => {
      val q = t(s, dir, "events")
        .select(col("user_id"),
          timestamp_seconds(floor(unix_timestamp(col("ts")) / 900) * 900).as("t15"))
        .distinct()
      CleanOps.infillFixedCadence(q, Seq("user_id"), "t15", "v_eraqc", "15 minutes")
        .groupBy(col("user_id"))
        .agg(sum(when(col("v_eraqc") === 30, 1).otherwise(0)).as("n_infilled"),
          count(lit(1)).as("n"))
    }),

    // P5: drop groups where the value is null for every row (SURVEY §2.2 P5)
    "p5_drop_all_null" -> ((s, dir) => {
      val e = t(s, dir, "events")
        .withColumn("v", when(col("value") > 489, col("value")))
      CleanOps.dropGroupsAllNull(e, Seq("user_id"), "v")
        .groupBy(col("event_type")).agg(count(lit(1)).as("n"))
    }),

    // P9: flag-aware valid-obs predicate (SURVEY §2.2 P9)
    "p9_valid_obs" -> ((s, dir) => {
      t(s, dir, "events").withColumn("flag", synthFlag)
        .filter(CleanOps.validObs(col("flag")))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"), dsum(col("value")).as("total"))
    }),

    // P11: per-group conditional unit rescale (SURVEY §2.2 P11)
    "p11_rescale" -> ((s, dir) => {
      CleanOps.conditionalRescale(t(s, dir, "events"), Seq("user_id"), "value",
          threshold = 45.0, factor = 100.0)
        .groupBy(col("event_type")).agg(dsum(col("value")).as("total"))
    }),

    // J3: co-located grouping (SURVEY §2.3 J3)
    "j3_colocated" -> ((s, dir) => {
      JoinOps.colocatedGroups(t(s, dir, "customer"),
          Seq("c_nationkey", "c_mktsegment"), "c_custkey")
        .select(col("c_nationkey"), col("c_mktsegment"), col("n"),
          element_at(col("members"), 1).as("first_member"),
          element_at(col("members"), -1).as("last_member"))
    }),

    // J4: latest-wins overlap union of two prioritized slices (SURVEY §2.3 J4)
    "j4_latest_wins" -> ((s, dir) => {
      val e = t(s, dir, "events").withColumn("hour_ts", date_trunc("HOUR", col("ts")))
      val odd = e.filter(col("event_id") % 2 === 1)
      val even = e.filter(col("event_id") % 2 === 0)
      JoinOps.latestWins(Seq(odd, even), Seq("user_id", "hour_ts"), col("event_id"))
        .select(col("user_id"), unix_timestamp(col("hour_ts")).as("hour_s"),
          col("event_id"), col("value"))
    }),

    // As-of join: each event picks the latest 4-hourly calibration snapshot at or
    // before its timestamp; events before the first snapshot stay unmatched
    "j11_asof_join" -> ((s, dir) => {
      val e = t(s, dir, "events")
      val snaps = e
        .groupBy(col("user_id"), date_trunc("HOUR", col("ts")).as("snap_ts"))
        .agg(min_by(col("value"),
          when(col("value").isNotNull, struct(col("ts"), col("event_id")))).as("cal"))
        .filter(hour(col("snap_ts")) % 4 === 0)
      JoinOps.asOfJoin(e, snaps, Seq("user_id"), "ts", "snap_ts", Seq("cal"))
        .groupBy(col("user_id"))
        .agg(count(lit(1)).as("n"), count(col("cal")).as("n_matched"),
          dsum(col("cal")).as("total_cal"))
    }),

    // Range join: events inside 2-hour maintenance windows opening every 4 hours,
    // bucketized equi-join (no nested-loop), exact residual filter
    "j12_range_join" -> ((s, dir) => {
      val e = t(s, dir, "events")
      val wins = e
        .select(col("user_id"), date_trunc("HOUR", col("ts")).as("wstart"))
        .distinct()
        .filter(hour(col("wstart")) % 4 === 0)
        .withColumn("wend", col("wstart") + expr("INTERVAL 2 HOURS"))
      JoinOps.rangeJoin(e, wins, Seq("user_id"), "ts", "wstart", "wend",
          bucketWidth = 7200L)
        .groupBy(col("user_id"))
        .agg(count(lit(1)).as("n"), dsum(col("value")).as("total"))
    }),

    // A2 (analog): climatological median per (event_type, hour-of-day) (SURVEY §2.4 A2)
    "a2_clim_median" -> ((s, dir) => {
      AggOps.groupedPercentile(
          t(s, dir, "events").withColumn("hr", hour(col("ts"))),
          Seq("event_type", "hr"), "value", 0.5, out = "med")
        .select(col("event_type"), col("hr"), r4(col("med")).as("med"))
    }),

    // A5: frequent-bin detection over an injected spike (SURVEY §2.4 A5)
    "a5_frequent_bins" -> ((s, dir) => {
      val e = t(s, dir, "events")
        .withColumn("v", when(col("event_id") % 3 === 0, 42.2).otherwise(col("value")))
      val hist = AggOps.histogram(e, Seq("event_type"), "v", origin = 0.0, width = 1.0)
      AggOps.frequentBins(hist, Seq("event_type"), frac = 0.5, minCount = 30)
        .select(col("event_type"), col("bin"), col("count").as("cnt"))
    }),

    // A6: winsorized mean (SURVEY §2.4 A6)
    "a6_winsorized_mean" -> ((s, dir) => {
      AggOps.winsorizedMean(t(s, dir, "events"), Seq("event_type"), "value")
        .select(col("event_type"), r4(col("wmean")).as("wmean"))
    }),

    // A10: flag value_counts per variable (SURVEY §2.4 A10)
    "a10_flag_counts" -> ((s, dir) => {
      t(s, dir, "events")
        .withColumn("flag", coalesce(synthFlag.cast("string"), lit("no_flag")))
        .groupBy(col("event_type"), col("flag")).agg(count(lit(1)).as("cnt"))
    }),

    // A11: flag-rate table (SURVEY §2.4 A11)
    "a11_flag_rates" -> ((s, dir) => {
      t(s, dir, "events").withColumn("flag", synthFlag)
        .groupBy(col("event_type"))
        .agg(count(col("flag")).as("n_flagged"), count(lit(1)).as("n_obs"),
          r4(count(col("flag")).cast("double") / count(lit(1))).as("flag_rate"))
    }),

    // A12: record-length bypass counts per (series, month) over multi-year lineitem
    // (SURVEY §2.4 A12)
    "a12_var_length" -> ((s, dir) => {
      GapOps.varLengthByMonth(
          t(s, dir, "lineitem").withColumnRenamed("l_shipdate", "t"),
          Seq("l_returnflag"), "t")
        .select(col("l_returnflag"), col("month"), col("n_years"))
    }),

    // A15: mean/std Gaussian fit (population std, as numpy norm.fit) (SURVEY §2.4 A15)
    "a15_gauss_fit" -> ((s, dir) => {
      t(s, dir, "events").groupBy(col("event_type"))
        .agg(r4(avg(col("value"))).as("mu"), r4(stddev_pop(col("value"))).as("sigma"))
    }),

    // O6: top-1 by count / majority vote (SURVEY §2.6 O6)
    "o6_top1_by_count" -> ((s, dir) => {
      t(s, dir, "events").withColumn("v", round(col("value"), 0))
        .groupBy(col("event_type"), col("v")).agg(count(lit(1)).as("cnt"))
        .groupBy(col("event_type"))
        .agg(max_by(col("v"), struct(col("cnt"), -col("v"))).as("modal_v"),
          max(struct(col("cnt"), -col("v"))).getField("cnt").as("cnt"))
    }),

    // W1: lag/diff (SURVEY §2.5 W1)
    "w1_diffs" -> ((s, dir) => {
      val d = SeriesOps.withDiffs(t(s, dir, "events"), Seq("user_id"), "ts", "value")
      // decimal-summed average: order-independent across engines
      d.groupBy(col("user_id"))
        .agg(count(col("diff")).as("n_diffs"),
          r4(sum(abs(col("diff")).cast("decimal(18,6)")).cast("double") / count(col("diff")))
            .as("mean_abs_diff"))
    }),

    // W10: lag-1 autocorrelation (SURVEY §2.5 W10)
    "w10_autocorr" -> ((s, dir) => {
      SeriesOps.lag1Autocorr(t(s, dir, "events"), Seq("user_id"), "ts", "value")
        .select(col("user_id"), r4(col("autocorr")).as("autocorr"))
    }),

    // W16: hourly sum with all-null-stays-null (SURVEY §2.5 W16)
    "w16_hourly_sum" -> ((s, dir) => {
      val e = t(s, dir, "events")
        .withColumn("v", when(col("value") >= 5, col("value")))
      SeriesOps.hourlySum(e, Seq("user_id"), "ts", "v")
        .select(col("user_id"), unix_timestamp(col("hour_ts")).as("hour_s"),
          round(col("v"), 2).as("v"))
    }),

    // W17: hourly flag concat (SURVEY §2.5 W17)
    "w17_flag_concat" -> ((s, dir) => {
      t(s, dir, "events").withColumn("flag", synthFlag.cast("string"))
        .groupBy(col("user_id"), date_trunc("HOUR", col("ts")).as("hour_ts"))
        .agg(SeriesOps.flagConcat(col("flag")).as("flags"))
        .select(col("user_id"), unix_timestamp(col("hour_ts")).as("hour_s"), col("flags"))
    }),

    // W18: hourly grid infill + marker (SURVEY §2.5 W18)
    "w18_gap_infill" -> ((s, dir) => {
      val hourly = SeriesOps.hourlySum(t(s, dir, "events"), Seq("user_id"), "ts", "value")
      SeriesOps.gapInfill(hourly, Seq("user_id"), "hour_ts")
        .groupBy(col("user_id"), col("standardized_infill"))
        .agg(count(lit(1)).as("n"))
    }),

    // W19: monthly grouper over multi-year lineitem (SURVEY §2.5 W19)
    "w19_monthly" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .groupBy(date_trunc("MONTH", col("l_shipdate")).cast("date").cast("string").as("month_start"))
        .agg(count(lit(1)).as("n"), dsum(col("l_quantity")).as("qty"))
    }),

    // J5: flag-meanings decode join (SURVEY §2.3 J5)
    "j5_flag_decode" -> ((s, dir) => {
      val counts = t(s, dir, "events").withColumn("flag", synthFlag)
        .filter(col("flag").isNotNull)
        .groupBy(col("flag")).agg(count(lit(1)).as("cnt"))
      counts.join(broadcast(graft.core.Lookups.flagMeaningsDf(s)),
          counts("flag") === col("flag_value"))
        .select(col("flag_value"), col("qaqc_function"), col("cnt"))
    })
  )

  def oracles: Map[String, String] = Map(
    "p1_sentinels" ->
      """SELECT event_type,
           COUNT(CASE WHEN round(value, 0) IN (42.0, 100.0) THEN NULL ELSE round(value, 0) END) AS n_valid,
           COUNT(*) AS n
         FROM events GROUP BY event_type""",
    "p3_bbox" ->
      """SELECT COUNT(*) AS n,
           CAST(SUM(CAST(s_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_bal
         FROM supplier
         WHERE s_acctbal BETWEEN 1000.0 AND 4000.0 AND s_nationkey BETWEEN 5.0 AND 20.0""",
    "p4_polygon" ->
      """SELECT COUNT(*) AS n,
           CAST(SUM(CAST(s_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_bal
         FROM (SELECT s_acctbal, s_acctbal/1000.0 AS x, s_nationkey AS y FROM supplier)
         WHERE y > -0.5 AND x < 6.0 AND x >= 0.0
           AND y < (25.0/6.0) * x - 0.5""",
    "j2_metadata_join" ->
      """SELECT n_name, COUNT(*) AS n,
           CAST(SUM(CAST(s_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS bal
         FROM supplier LEFT JOIN nation ON s_nationkey = n_nationkey
         GROUP BY n_name""",
    "c3_elev_infill" ->
      """WITH e AS (
           SELECT user_id, ts,
                  CASE WHEN value < 400 THEN NULL ELSE value END AS elev
           FROM events),
         st AS (SELECT user_id,
                  bool_or(elev IS NOT NULL) AS any_nn,
                  any_value(elev ORDER BY ts) AS fill
                FROM e GROUP BY user_id),
         dem AS (SELECT DISTINCT user_id, CAST(user_id AS DOUBLE) * 10 AS dem_elev
                FROM events WHERE user_id % 2 = 0),
         f AS (SELECT e.user_id,
                  CASE WHEN e.elev IS NOT NULL THEN NULL
                       WHEN st.any_nn THEN 4
                       WHEN dem.dem_elev IS NOT NULL THEN 3
                       ELSE 5 END AS flag,
                  CASE WHEN e.elev IS NOT NULL THEN e.elev
                       WHEN st.any_nn THEN st.fill
                       WHEN dem.dem_elev IS NOT NULL THEN dem.dem_elev
                       ELSE 0.0 END AS elev2
               FROM e
               JOIN st ON e.user_id = st.user_id
               LEFT JOIN dem ON e.user_id = dem.user_id)
         SELECT CAST(flag AS BIGINT) AS flag, COUNT(*) AS n,
           CAST(SUM(CAST(round(elev2, 2) AS DECIMAL(18,2))) AS DOUBLE) AS total_elev
         FROM f GROUP BY 1""",
    "j11_asof_join" ->
      """WITH snaps AS (
           SELECT user_id, date_trunc('hour', ts) AS snap_ts,
                  any_value(value ORDER BY ts, event_id) AS cal
           FROM events GROUP BY 1, 2),
         s4 AS (SELECT * FROM snaps WHERE hour(snap_ts) % 4 = 0),
         m AS (
           SELECT e.user_id, s.cal
           FROM events e ASOF LEFT JOIN s4 s
             ON e.user_id = s.user_id AND e.ts >= s.snap_ts)
         SELECT user_id, COUNT(*) AS n, COUNT(cal) AS n_matched,
                CAST(SUM(CAST(cal AS DECIMAL(18,2))) AS DOUBLE) AS total_cal
         FROM m GROUP BY 1""",
    "j12_range_join" ->
      """WITH w AS (
           SELECT DISTINCT user_id, date_trunc('hour', ts) AS wstart
           FROM events WHERE hour(date_trunc('hour', ts)) % 4 = 0),
         w2 AS (SELECT user_id, wstart, wstart + INTERVAL 2 HOUR AS wend FROM w)
         SELECT e.user_id, COUNT(*) AS n,
                CAST(SUM(CAST(e.value AS DECIMAL(18,2))) AS DOUBLE) AS total
         FROM events e JOIN w2
           ON e.user_id = w2.user_id AND e.ts >= w2.wstart AND e.ts < w2.wend
         GROUP BY 1""",
    "c30_cadence_infill" ->
      """WITH q AS (
           SELECT DISTINCT user_id, to_timestamp(floor(epoch(ts) / 900) * 900) AS t15
           FROM events),
         grid AS (
           SELECT user_id,
                  unnest(generate_series(min(t15), max(t15), INTERVAL 15 MINUTE)) AS t15
           FROM q GROUP BY user_id)
         SELECT g.user_id,
                CAST(SUM(CASE WHEN o.t15 IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_infilled,
                COUNT(*) AS n
         FROM grid g LEFT JOIN q o ON g.user_id = o.user_id AND g.t15 = o.t15
         GROUP BY 1""",
    "p5_drop_all_null" ->
      """SELECT event_type, COUNT(*) AS n FROM events
         WHERE user_id IN (SELECT user_id FROM events WHERE value > 489 GROUP BY user_id)
         GROUP BY event_type""",
    "p9_valid_obs" ->
      """SELECT event_type, COUNT(*) AS n,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total
         FROM events
         WHERE NOT (value > 400) GROUP BY event_type""",
    "p11_rescale" ->
      """SELECT event_type,
           CAST(SUM(CAST(v AS DECIMAL(18,2))) AS DOUBLE) AS total
         FROM (
           SELECT event_type,
                  CASE WHEN AVG(value) OVER (PARTITION BY user_id) < 45.0
                       THEN value * 100.0 ELSE value END AS v
           FROM events)
         GROUP BY event_type""",
    "j3_colocated" ->
      """SELECT c_nationkey, c_mktsegment, COUNT(*) AS n,
           MIN(c_custkey) AS first_member, MAX(c_custkey) AS last_member
         FROM customer GROUP BY 1, 2 HAVING COUNT(*) > 1""",
    "j4_latest_wins" ->
      """SELECT user_id, CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS hour_s,
           event_id, value
         FROM (
           SELECT user_id, ts, event_id, value,
                  row_number() OVER (PARTITION BY user_id, date_trunc('hour', ts)
                                     ORDER BY event_id DESC) AS rn
           FROM events) WHERE rn = 1""",
    "a2_clim_median" ->
      """SELECT event_type, hour(ts) AS hr, ROUND(quantile_cont(value, 0.5), 4) + 0 AS med
         FROM events GROUP BY 1, 2""",
    "a5_frequent_bins" ->
      """WITH h AS (
           SELECT event_type, CAST(FLOOR(v / 1.0) AS BIGINT) AS bin, COUNT(*) AS cnt
           FROM (SELECT event_type,
                        CASE WHEN event_id % 3 = 0 THEN 42.2 ELSE value END AS v
                 FROM events)
           GROUP BY 1, 2)
         SELECT event_type, bin, cnt FROM (
           SELECT event_type, bin, cnt,
                  SUM(cnt) OVER (PARTITION BY event_type ORDER BY bin
                                 RANGE BETWEEN 3 PRECEDING AND 3 FOLLOWING) AS hood
           FROM h)
         WHERE cnt > hood * 0.5 AND cnt > 30""",
    "a6_winsorized_mean" ->
      """WITH b AS (
           SELECT event_type,
                  quantile_cont(value, 0.05) AS lo, quantile_cont(value, 0.95) AS hi
           FROM events GROUP BY 1)
         SELECT e.event_type,
                ROUND(AVG(LEAST(GREATEST(e.value, b.lo), b.hi)), 4) + 0 AS wmean
         FROM events e JOIN b ON e.event_type = b.event_type
         GROUP BY e.event_type""",
    "a10_flag_counts" ->
      """SELECT event_type,
           COALESCE(CASE WHEN value > 400 THEN '11' WHEN value < 1 THEN '19' END, 'no_flag') AS flag,
           COUNT(*) AS cnt
         FROM events GROUP BY 1, 2""",
    "a11_flag_rates" ->
      """SELECT event_type,
           COUNT(CASE WHEN value > 400 THEN 1 WHEN value < 1 THEN 1 END) AS n_flagged,
           COUNT(*) AS n_obs,
           ROUND(CAST(COUNT(CASE WHEN value > 400 THEN 1 WHEN value < 1 THEN 1 END) AS DOUBLE)
                 / COUNT(*), 4) AS flag_rate
         FROM events GROUP BY event_type""",
    "a12_var_length" ->
      """SELECT l_returnflag, month(l_shipdate) AS month,
           COUNT(DISTINCT year(l_shipdate)) AS n_years
         FROM lineitem GROUP BY 1, 2""",
    "a15_gauss_fit" ->
      """SELECT event_type, ROUND(AVG(value), 4) + 0 AS mu,
           ROUND(stddev_pop(value), 4) AS sigma
         FROM events GROUP BY event_type""",
    "o6_top1_by_count" ->
      """SELECT event_type, v AS modal_v, cnt FROM (
           SELECT event_type, v, cnt,
                  row_number() OVER (PARTITION BY event_type ORDER BY cnt DESC, v ASC) AS rn
           FROM (SELECT event_type, round(value, 0) + 0 AS v, COUNT(*) AS cnt
                 FROM events GROUP BY 1, 2))
         WHERE rn = 1""",
    "w1_diffs" ->
      """SELECT user_id, COUNT(d) AS n_diffs,
           ROUND(CAST(SUM(CAST(ABS(d) AS DECIMAL(18,6))) AS DOUBLE) / COUNT(d), 4) AS mean_abs_diff
         FROM (
           SELECT user_id,
                  value - lag(value) OVER (PARTITION BY user_id ORDER BY ts) AS d
           FROM events)
         GROUP BY user_id""",
    "w10_autocorr" ->
      """SELECT user_id, ROUND(corr(value, lv), 4) + 0 AS autocorr FROM (
           SELECT user_id, value,
                  lag(value) OVER (PARTITION BY user_id ORDER BY ts) AS lv
           FROM events)
         WHERE lv IS NOT NULL
         GROUP BY user_id""",
    "w16_hourly_sum" ->
      """SELECT user_id, CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS hour_s,
           ROUND(CASE WHEN COUNT(v) = 0 THEN NULL ELSE SUM(v) END, 2) + 0 AS v
         FROM (SELECT user_id, ts, CASE WHEN value >= 5 THEN value END AS v FROM events)
         GROUP BY 1, 2""",
    "w17_flag_concat" ->
      """SELECT user_id, CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS hour_s,
           CASE WHEN COUNT(DISTINCT f) = 0 THEN 'nan'
                ELSE array_to_string(list_sort(list(DISTINCT f)), ',') END AS flags
         FROM (SELECT user_id, ts,
                      CASE WHEN value > 400 THEN '11' WHEN value < 1 THEN '19' END AS f
               FROM events)
         GROUP BY 1, 2""",
    "w18_gap_infill" ->
      """WITH hourly AS (
           SELECT user_id, date_trunc('hour', ts) AS hour_ts FROM events GROUP BY 1, 2),
         grid AS (
           SELECT user_id,
                  unnest(generate_series(min(hour_ts), max(hour_ts), INTERVAL 1 HOUR)) AS hour_ts
           FROM hourly GROUP BY user_id)
         SELECT g.user_id,
                CASE WHEN h.hour_ts IS NULL THEN 'y' ELSE 'n' END AS standardized_infill,
                COUNT(*) AS n
         FROM grid g LEFT JOIN hourly h
           ON g.user_id = h.user_id AND g.hour_ts = h.hour_ts
         GROUP BY 1, 2""",
    "w19_monthly" ->
      """SELECT CAST(CAST(date_trunc('month', l_shipdate) AS DATE) AS VARCHAR) AS month_start,
           COUNT(*) AS n,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS qty
         FROM lineitem GROUP BY 1""",
    "j5_flag_decode" ->
      """WITH meanings(flag_value, qaqc_function) AS (
           VALUES (11, 'world_record'), (19, 'short_record')),
         counts AS (
           SELECT CASE WHEN value > 400 THEN 11 WHEN value < 1 THEN 19 END AS flag,
                  COUNT(*) AS cnt
           FROM events
           WHERE value > 400 OR value < 1
           GROUP BY 1)
         SELECT m.flag_value, m.qaqc_function, c.cnt
         FROM counts c JOIN meanings m ON c.flag = m.flag_value"""
  )
}
