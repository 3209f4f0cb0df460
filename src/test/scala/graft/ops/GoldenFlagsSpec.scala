package graft.ops

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.core.Flags
import graft.pipeline.{DeriveDag, QaqcPipeline}

/** Golden flag fixtures (SURVEY §5d): for every flag-writing operator, a minimal
  * engineered station triggers the check and the EXACT integer code (era_qaqc taxonomy,
  * `/root/reference/data/era_qaqc_flag_meanings.csv:1-39`) must land on the engineered
  * row — and nowhere else. Guards against code/check mix-ups that row-count tests miss. */
class GoldenFlagsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private def flagsOf(df: org.apache.spark.sql.DataFrame, flagCol: String): Set[Int] =
    df.select(flagCol).filter(col(flagCol).isNotNull)
      .distinct().as[Int].collect().toSet

  test("flag 2: observations past a buoy's disestablishment cutoff") {
    val obs = Seq(("b1", ts("2024-01-01 00:00:00"), 1.0),
                  ("b1", ts("2024-06-01 00:00:00"), 2.0),
                  ("b2", ts("2024-06-01 00:00:00"), 3.0))
      .toDF("station", "time", "tas")
      .withColumn("tas_eraqc", lit(null).cast("int"))
    val cutoffs = Seq(("b1", ts("2024-03-01 00:00:00"))).toDF("station", "cutoff_ts")
    val out = CleanOps.flagDisestablished(obs, "station", "time", Seq("tas_eraqc"), cutoffs)
    assert(flagsOf(out, "tas_eraqc") == Set(Flags.BuoyMissingPosition))
    assert(out.filter(col("tas_eraqc").isNotNull).select("station", "time")
      .as[(String, Timestamp)].collect().toSeq == Seq(("b1", ts("2024-06-01 00:00:00"))))
  }

  test("flag 1: known-issue hour window flags only affected station and hours") {
    val obs = Seq(("p1", ts("2024-01-01 10:00:00"), 4.0),  // in window -> 1
                  ("p1", ts("2024-01-01 23:00:00"), 4.0),  // outside hours
                  ("p2", ts("2024-01-01 10:00:00"), 4.0))  // unaffected station
      .toDF("station", "time", "sfcWind")
      .withColumn("sfcWind_eraqc", lit(null).cast("int"))
    val issues = Seq(("p1", 6, 20)).toDF("station", "hour_lo", "hour_hi")
    val out = CleanOps.flagKnownIssueHours(obs, "station", "time",
      Seq("sfcWind_eraqc"), issues)
    assert(flagsOf(out, "sfcWind_eraqc") == Set(Flags.BuoyDrift))
    assert(out.filter(col("sfcWind_eraqc").isNotNull).count() == 1)
  }

  test("flags 3/4/5: elevation infill source tagging") {
    val obs = Seq(
      ("dem", ts("2024-01-01 00:00:00"), None: Option[Double]),     // null elev, DEM row
      ("nbr", ts("2024-01-01 00:00:00"), Some(120.0)),              // donor for its own gap
      ("nbr", ts("2024-01-02 00:00:00"), None),                     // neighbor-filled
      ("bad", ts("2024-01-01 00:00:00"), None))                     // nothing available
      .toDF("station", "time", "elevation")
      .withColumn("elevation_eraqc", lit(null).cast("int"))
    val dem = Seq(("dem", 55.0)).toDF("station", "dem_elev")
    val out = CleanOps.elevInfill(obs, Seq("station"), "time", "elevation",
      "elevation_eraqc", dem)
    val byStation = out.filter(col("elevation_eraqc").isNotNull)
      .select("station", "elevation_eraqc").as[(String, Int)].collect().toMap
    assert(byStation == Map("dem" -> Flags.ElevInfillDem,
      "nbr" -> Flags.ElevInfillNeighbor, "bad" -> Flags.ElevInfillFailed))
  }

  test("flags 10/11: negative precip and world-record bounds respect prior flags") {
    val obs = Seq((1L, -5.0), (2L, 999.0), (3L, 10.0)).toDF("id", "pr")
      .withColumn("pr_eraqc", lit(null).cast("int"))
    val out = LogicOps.flagNegative(
      CleanOps.flagOutOfBounds(obs, "pr", "pr_eraqc", -100.0, 500.0), "pr", "pr_eraqc")
    val m = out.filter(col("pr_eraqc").isNotNull)
      .select("id", "pr_eraqc").as[(Long, Int)].collect().toMap
    assert(m == Map(1L -> Flags.NegativePrecip, 2L -> Flags.WorldRecord))
  }

  test("flag 12: supersaturation (dewpoint above air temperature)") {
    val obs = Seq((1L, 280.0, 285.0), (2L, 280.0, 275.0)).toDF("id", "tas", "tdps")
      .withColumn("tdps_eraqc", lit(null).cast("int"))
      .withColumn("tas_eraqc", lit(null).cast("int"))
    val out = LogicOps.flagSupersaturation(obs, "tdps", "tas", "tdps_eraqc", col("tas_eraqc"))
    val m = out.filter(col("tdps_eraqc").isNotNull)
      .select("id", "tdps_eraqc").as[(Long, Int)].collect().toMap
    assert(m == Map(1L -> Flags.Supersaturation))
  }

  test("flags 14/15: calm-wind direction logic") {
    // 14: calm wind but nonzero direction; 15: wind blowing but direction 0
    // (the op then normalizes dir 0 -> 360), `qaqc_logic_checks.py` calm-wind block
    val obs = Seq((1L, 0.0, 270.0), (2L, 5.0, 0.0), (3L, 0.0, 0.0))
      .toDF("id", "sfcWind", "sfcWind_dir")
      .withColumn("sfcWind_dir_eraqc", lit(null).cast("int"))
      .withColumn("sfcWind_eraqc", lit(null).cast("int"))
    val out = LogicOps.flagCalmWindDir(obs, "sfcWind", "sfcWind_dir",
      "sfcWind_dir_eraqc", col("sfcWind_eraqc"))
    val m = out.filter(col("sfcWind_dir_eraqc").isNotNull)
      .select("id", "sfcWind_dir_eraqc").as[(Long, Int)].collect().toMap
    assert(m == Map(1L -> Flags.CalmWindBadDir, 2L -> Flags.CalmWindZeroDir))
  }

  test("flag 16: shorter accumulation window exceeding the longer one") {
    val obs = Seq((1L, 30.0, 10.0), (2L, 5.0, 10.0)).toDF("id", "pr_1h", "pr_24h")
      .withColumn("f", lit(null).cast("int"))
      .withColumn("f1", lit(null).cast("int"))
      .withColumn("f24", lit(null).cast("int"))
    val out = LogicOps.flagAccumWindow(obs, "pr_1h", "pr_24h", "f",
      col("f1"), col("f24"), Flags.PrecipAccumWindowA)
    val m = out.filter(col("f").isNotNull).select("id", "f").as[(Long, Int)].collect().toMap
    assert(m == Map(1L -> Flags.PrecipAccumWindowA))
  }

  test("flags 23/28 end-to-end: the QAQC pipeline stamps spike and streak codes") {
    // 80 minutely points (> the 50/month spike minimum): a pseudo-noisy baseline (the
    // monthly 6x-IQR critical value must be positive or every diff is a "candidate"
    // and none confirms), a lone +3000 spike at t=20, then a 6-point straight repeat
    val rows = (0 until 80).map { i =>
      val v = if (i == 20) 3100.0
        else if (i >= 30 && i < 36) 77.0
        else 100.0 + 20.0 * math.sin(i.toDouble)
      ("s1", ts(f"2024-01-01 ${i / 60}%02d:${i % 60}%02d:00"), v)
    }
    val obs = rows.toDF("station", "time", "v")
      .withColumn("v_eraqc", lit(null).cast("int"))
    val out = QaqcPipeline.run(obs, QaqcPipeline.singleVariable(
      "station", "time", "v", lo = 0.0, hi = 5000.0,
      streakNValues = 5, streakNDays = 9999, streakMinSeqLen = 5))
    val flags = flagsOf(out, "v_eraqc")
    assert(flags.contains(Flags.Spike), s"spike missing: $flags")
    assert(flags.contains(Flags.StraightStreak), s"streak missing: $flags")
  }

  test("flag 30: cadence infill marks only grid-inserted rows") {
    val obs = Seq(("g1", ts("2024-01-01 00:00:00"), 1.0),
                  ("g1", ts("2024-01-01 00:45:00"), 2.0)) // 00:15 and 00:30 missing
      .toDF("station", "t15", "v")
    val out = CleanOps.infillFixedCadence(obs, Seq("station"), "t15", "v_eraqc")
    assert(out.count() == 4)
    assert(flagsOf(out, "v_eraqc") == Set(Flags.ValleywaterInfill))
    assert(out.filter(col("v_eraqc").isNotNull).count() == 2)
    assert(out.filter(col("v_eraqc").isNotNull && col("v").isNotNull).count() == 0)
  }

  test("flag 31: frequent identical moderate daily precip totals") {
    // station s1: 5 consecutive non-zero days at 20.0 (> 18) -> all their obs flag;
    // a zero day inside would break nothing because zeros leave the non-zero-day
    // sequence; station s2: only a 3-day run (below dayThresh) -> untouched;
    // station s3: 5-day run at 10.0 (<= moderate) -> untouched
    def obsOf(st: String, day: Int, v: Double) = Seq(
      (st, ts(f"2024-02-$day%02d 06:00:00"), v / 2),
      (st, ts(f"2024-02-$day%02d 18:00:00"), v / 2))
    val rows =
      (1 to 5).flatMap(d => obsOf("s1", d, 20.0)) ++
      obsOf("s1", 6, 3.0) ++                      // different total after the run
      (1 to 3).flatMap(d => obsOf("s2", d, 20.0)) ++
      (1 to 5).flatMap(d => obsOf("s3", d, 10.0))
    val df = rows.toDF("station", "time", "pr")
      .withColumn("pr_eraqc", lit(null).cast("int"))
    val out = AggOps.frequentPrecipFlag(df, Seq("station"), "time", "pr", "pr_eraqc")
    assert(flagsOf(out, "pr_eraqc") == Set(Flags.PrecipDailyFrequent))
    val flagged = out.filter(col("pr_eraqc").isNotNull)
      .select("station", "time").as[(String, Timestamp)].collect()
    assert(flagged.forall(_._1 == "s1") && flagged.length == 10)
    assert(flagged.forall(_._2.before(ts("2024-02-06 00:00:00"))))
  }

  test("flag 32: daily-precip climatological outlier vs monthly nonzero p95") {
    // s1: 25 ordinary days (1..5 mm) dominate the sorted order, so the nonzero
    // p95 interpolates between two ordinaries (= 5) -> 9*p95 = 45; day 28 = 100
    // exceeds it -> flagged; the zero day never enters the p95 population
    val rows =
      (1 to 25).flatMap(d =>
        Seq(("s1", ts(f"2024-03-$d%02d 06:00:00"), 1.0 + d % 5))) ++
      Seq(("s1", ts("2024-03-27 06:00:00"), 0.0),
          ("s1", ts("2024-03-28 06:00:00"), 100.0))
    val df = rows.toDF("station", "time", "pr")
      .withColumn("pr_eraqc", lit(null).cast("int"))
    val out = AggOps.climOutlierPrecipFlag(df, Seq("station"), "time", "pr", "pr_eraqc")
    assert(flagsOf(out, "pr_eraqc") == Set(Flags.PrecipDailyOutlier))
    val flagged = out.filter(col("pr_eraqc").isNotNull)
      .select("time").as[Timestamp].collect().toSet
    assert(flagged == Set(ts("2024-03-28 06:00:00")))
  }

  test("flag 33: daily-precip unusual gap via sorted-neighbor min-gap") {
    // s1: ordinary days 0..40 mm; day 25 = 500 is > 200 from EVERY other total
    // (including the zero grid days) -> flagged. s2: two 500s on adjacent days
    // are 0 apart from each other -> neither flags (the all-others rule).
    val rows =
      (1 to 10).flatMap(d => Seq(("s1", ts(f"2024-04-$d%02d 06:00:00"), d * 4.0))) ++
      Seq(("s1", ts("2024-04-25 06:00:00"), 500.0)) ++
      (1 to 10).flatMap(d => Seq(("s2", ts(f"2024-04-$d%02d 06:00:00"), d * 4.0))) ++
      Seq(("s2", ts("2024-04-24 06:00:00"), 500.0),
          ("s2", ts("2024-04-25 06:00:00"), 500.0))
    val df = rows.toDF("station", "time", "pr")
      .withColumn("pr_eraqc", lit(null).cast("int"))
    val out = AggOps.unusualGapsPrecipFlag(df, Seq("station"), "time", "pr", "pr_eraqc")
    assert(flagsOf(out, "pr_eraqc") == Set(Flags.PrecipDailyGap))
    val flagged = out.filter(col("pr_eraqc").isNotNull)
      .select("station", "time").as[(String, Timestamp)].collect().toSet
    assert(flagged == Set(("s1", ts("2024-04-25 06:00:00"))))
  }

  test("flags 34/35: de-accumulation stage replaces the gauge and stamps provenance") {
    import graft.ops.SeriesOps
    // s1: rising gauge (positive-subseries autocorr ~1 -> accumulated) with one
    // SMALL negative non-reset glitch at t5 (28 -> 25; neighbor diffs stay at or
    // under the ringing magnitude threshold so only the negative-diff rule fires):
    // that row's deacc nulls + flag 34, the original gauge moves to accum_pr with
    // whole-column flag 35
    val s1 = Seq(0.0, 10, 20, 20, 28, 25, 33, 43, 53, 63).zipWithIndex.map {
      case (v, i) => ("s1", ts(f"2024-05-01 ${i}%02d:00:00"), v)
    }
    // s2: alternating high-low (negative autocorr -> instantaneous) passes through
    val s2 = Seq(5.0, 1, 7, 2, 6, 1, 8, 2, 5, 1).zipWithIndex.map {
      case (v, i) => ("s2", ts(f"2024-05-01 ${i}%02d:00:00"), v)
    }
    val df = (s1 ++ s2).toDF("station", "time", "pr")
      .withColumn("pr_eraqc", lit(null).cast("int"))
    val out = SeriesOps.deaccumulatePrecipStage(df, Seq("station"), "time", "pr")
    val r1 = out.filter(col("station") === "s1").orderBy("time").collect()
    // flag 34 on exactly the glitch row; its pr (deacc) is null
    val glitch = r1(5)
    assert(glitch.getAs[Int]("pr_eraqc") == Flags.DeaccumAmbiguous)
    assert(glitch.isNullAt(glitch.fieldIndex("pr")))
    assert(r1.count(!_.isNullAt(r1.head.fieldIndex("pr_eraqc"))) == 1)
    // accum_pr keeps the original gauge, provenance 35 on the whole column
    assert(r1.map(_.getAs[Double]("accum_pr")).toSeq ==
      Seq(0.0, 10, 20, 20, 28, 25, 33, 43, 53, 63))
    assert(r1.forall(_.getAs[Int]("accum_pr_eraqc") == Flags.DeaccumProvenance))
    // de-accumulated values: first diff 0, then diffs
    assert(r1(1).getAs[Double]("pr") == 10.0 && r1(3).getAs[Double]("pr") == 0.0)
    // s2 untouched: original values, null flags, null accum columns
    val r2 = out.filter(col("station") === "s2").orderBy("time").collect()
    assert(r2.map(_.getAs[Double]("pr")).toSeq == Seq(5.0, 1, 7, 2, 6, 1, 8, 2, 5, 1))
    assert(r2.forall(r => r.isNullAt(r.fieldIndex("accum_pr")) &&
      r.isNullAt(r.fieldIndex("accum_pr_eraqc"))))
  }

  test("flag 36: elevation span inconsistency flags rows off the distinct-value median") {
    val obs = (Seq.fill(5)(100.0) ++ Seq.fill(5)(120.0) ++ Seq(400.0)).zipWithIndex
      .map { case (e, i) => ("s1", i.toLong, e) }
      .toDF("station", "id", "elev")
      .withColumn("elev_eraqc", lit(null).cast("int"))
    val out = AggOps.flagSpanInconsistent(obs, Seq("station"), "elev", "elev_eraqc")
    val flaggedVals = out.filter(col("elev_eraqc") === Flags.ElevInconsistent)
      .select("elev").as[Double].collect().toSet
    assert(flaggedVals == Set(400.0))
  }

  test("flag 38: derived variable inherits a synergistic flag from flagged inputs") {
    val obs = Seq((1L, 290.0, 50.0, Some(Flags.WorldRecord)), (2L, 290.0, 50.0, None))
      .toDF("id", "tas", "hurs", "tas_eraqc")
    val out = DeriveDag.deriveMissing(obs)
    val m = out.select("id", "tdps_derived_eraqc").as[(Long, Option[Int])].collect().toMap
    assert(m == Map(1L -> Some(Flags.DerivedSynergistic), 2L -> None))
    assert(out.filter(col("tdps_derived").isNotNull).count() == 2)
  }

  test("quantile gate keeps rows at or above the per-group quantile") {
    import spark.implicits._
    val df = Seq(
      ("a", 1L, 1.0), ("a", 2L, 2.0), ("a", 3L, 3.0), ("a", 4L, 4.0), ("a", 5L, 5.0),
      ("b", 6L, 10.0), ("b", 7L, 20.0))
      .toDF("g", "id", "v")
    // a: p50 = 3.0 -> keep 3,4,5; b: p50 = 15.0 -> keep 7
    val kept = graft.ops.AggOps.quantileGate(df, Seq("g"), "v", 0.5)
      .select("id").as[Long].collect().sorted
    assert(kept.toSeq == Seq(3L, 4L, 5L, 7L))
  }

  test("KS drift statistic: hand-computed cases, ties, and one-sided groups") {
    import spark.implicits._
    val df = Seq(
      // g1: a={1,2}, b={2,3} -> D = 0.5 (at x=1: 1/2 vs 0; tie at 2 exact via RANGE)
      ("g1", "a", 1.0), ("g1", "a", 2.0), ("g1", "b", 2.0), ("g1", "b", 3.0),
      // g2: identical samples -> D = 0
      ("g2", "a", 5.0), ("g2", "b", 5.0),
      // g3: only side a present -> D = 1 (maximal drift by definition)
      ("g3", "a", 7.0),
      // side values outside {a,b} are ignored
      ("g1", "zzz", 100.0))
      .toDF("g", "side", "v")
    val got = graft.ops.AggOps.ksStatistic(df, Seq("g"), "v", "side", "a", "b")
      .collect().map(r => r.getString(0) -> ((r.getDouble(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got("g1") == ((0.5, 2L, 2L)))
    assert(got("g2") == ((0.0, 1L, 1L)))
    assert(got("g3") == ((1.0, 1L, 0L)))
  }

  test("quantile gate approx path (the unbounded-key scale contract) tracks exact") {
    import spark.implicits._
    val rng = new scala.util.Random(23)
    val df = (1L to 2000L).map(i => ((i % 3).toString, i, rng.nextDouble() * 100))
      .toDF("g", "id", "v")
    val ex = graft.ops.AggOps.groupedPercentile(df, Seq("g"), "v", 0.8, out = "thr")
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val ap = graft.ops.AggOps.groupedPercentile(df, Seq("g"), "v", 0.8, out = "thr",
        exact = false, accuracy = 10000)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    // accuracy 10000 on ~667-row groups: rank error <= n/accuracy < 1 row, so the
    // approx threshold sits within one order statistic (~0.5 value units on U[0,100])
    ex.foreach { case (g, t) =>
      assert(math.abs(ap(g) - t) < 1.0, s"group $g: exact $t vs approx ${ap(g)}") }
    val nEx = graft.ops.AggOps.quantileGate(df, Seq("g"), "v", 0.8).count()
    val nAp = graft.ops.AggOps.quantileGate(df, Seq("g"), "v", 0.8, exact = false).count()
    assert(math.abs(nEx - nAp) <= 6, s"kept $nEx exact vs $nAp approx")
  }

  test("flags 6-9: sensor-height gates incl. the reference's row-0 wind quirk") {
    // s1: thermometer height null somewhere -> 6 (whole station)
    // s2: thermometer 2.5m (outside 2 +/- 1/3) -> 7; anemometer fine
    // s3: anemometer null somewhere -> 8 on BOTH wind flag columns
    // s4: anemometer FIRST row 10.9 (outside) -> 9, even though later rows are 10.0
    // s5: anemometer first row 10.0, LATER row 12.0 -> NOT flagged (the reference
    //     reads only row 0 for wind, qaqc_wholestation.py:674); thermometer fine
    def rows(st: String, th: Seq[java.lang.Double], an: Seq[java.lang.Double]) =
      th.zip(an).zipWithIndex.map { case ((t, a), i) =>
        (st, ts(f"2024-01-01 ${i}%02d:00:00"), t, a)
      }
    val obs = (rows("s1", Seq(2.0, null), Seq(10.0, 10.0)) ++
        rows("s2", Seq(2.5, 2.5), Seq(10.0, 10.0)) ++
        rows("s3", Seq(2.0, 2.0), Seq(null, 10.0)) ++
        rows("s4", Seq(2.0, 2.0), Seq(10.9, 10.0)) ++
        rows("s5", Seq(2.0, 2.0), Seq(10.0, 12.0)))
      .toDF("station", "time", "thermometer_height_m", "anemometer_height_m")
      .withColumn("tas_eraqc", lit(null).cast("int"))
      .withColumn("sfcWind_eraqc", lit(null).cast("int"))
      .withColumn("sfcWind_dir_eraqc", lit(null).cast("int"))
    val out = CleanOps.sensorHeightFlags(obs).cache()
    def flagOf(st: String, c: String): Option[Int] =
      out.filter(col("station") === st).select(c).distinct()
        .collect().map(r => Option(r.get(0)).map(_.asInstanceOf[Int])).head
    assert(flagOf("s1", "tas_eraqc").contains(Flags.ThermometerHeightMissing))
    assert(flagOf("s2", "tas_eraqc").contains(Flags.ThermometerHeightNot2m))
    assert(flagOf("s3", "sfcWind_eraqc").contains(Flags.AnemometerHeightMissing))
    assert(flagOf("s3", "sfcWind_dir_eraqc").contains(Flags.AnemometerHeightMissing))
    assert(flagOf("s4", "sfcWind_eraqc").contains(Flags.AnemometerHeightNot10m))
    assert(flagOf("s5", "sfcWind_eraqc").isEmpty, "row-0 quirk: later rows ignored")
    assert(flagOf("s5", "tas_eraqc").isEmpty)
    // every station's flag is uniform across its rows (whole-column assignment)
    assert(out.groupBy("station")
      .agg(countDistinct(coalesce(col("sfcWind_eraqc"), lit(-1))).as("n"))
      .filter(col("n") > 1).count() == 0)
  }
}
