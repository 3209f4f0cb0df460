package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Aggregation operators (SURVEY.md §2.4, A1–A17). Each is a generic grouped
  * transformation; climatology-style results (medians/IQR per group) are produced as
  * small keyed tables meant to be joined back (broadcast when the key space is small).
  */
object AggOps {

  /** A1/A2 — grouped exact percentile (median by default). One shuffle on `keys`;
    * partial aggregation applies map-side. */
  def groupedPercentile(df: DataFrame, keys: Seq[String], valueCol: String,
                        p: Double, out: String = "pctl"): DataFrame =
    df.groupBy(keys.map(col): _*).agg(expr(s"percentile($valueCol, $p)").as(out))

  /** A3 — IQR with a floor (reference floors at 1.5 IQR-units for climatological
    * outliers, `/root/reference/scripts/3_qaqc_data/qaqc_climatological_outlier.py:129-138`). */
  def groupedIqr(df: DataFrame, keys: Seq[String], valueCol: String,
                 floor: Double = 0.0, out: String = "iqr"): DataFrame =
    df.groupBy(keys.map(col): _*).agg(
      greatest(expr(s"percentile($valueCol, 0.75) - percentile($valueCol, 0.25)"),
        lit(floor)).as(out))

  /** A4 — fixed-width histogram: bin index per row (`floor((x − origin)/width)`).
    * Pure expression; the groupBy(bin) count is the caller's. */
  def binIndex(value: Column, origin: Double, width: Double): Column =
    floor((value - lit(origin)) / lit(width)).cast("long")

  def histogram(df: DataFrame, keys: Seq[String], valueCol: String,
                origin: Double, width: Double): DataFrame =
    df.withColumn("bin", binIndex(col(valueCol), origin, width))
      .groupBy((keys :+ "bin").map(col): _*).count()

  /** A5 — frequent-bin detection over a histogram: a bin is suspect when its count
    * exceeds `frac` of the surrounding ±3-bin mass and `minCount` obs
    * (`/root/reference/scripts/3_qaqc_data/qaqc_frequent.py:503-563`).
    * Input must be the output of [[histogram]]; window over bin index within keys. */
  def frequentBins(hist: DataFrame, keys: Seq[String], frac: Double = 0.5,
                   minCount: Long = 30): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(col("bin")).rowsBetween(-3, 3)
    hist.withColumn("neighborhood", sum(col("count")).over(w))
      .filter(col("count") > col("neighborhood") * frac && col("count") > minCount)
  }

  /** A6 — winsorized mean: clip at the group's p05/p95 then average — two-pass
    * percentile + clip, no UDAF (`qaqc_climatological_outlier.py:105-120`). */
  def winsorizedMean(df: DataFrame, keys: Seq[String], valueCol: String,
                     pLo: Double = 0.05, pHi: Double = 0.95, out: String = "wmean"): DataFrame = {
    val kc = keys.map(col)
    val bounds = df.groupBy(kc: _*).agg(
      expr(s"percentile($valueCol, $pLo)").as("_lo"),
      expr(s"percentile($valueCol, $pHi)").as("_hi"))
    df.join(bounds, keys)
      .withColumn("_clipped", least(greatest(col(valueCol), col("_lo")), col("_hi")))
      .groupBy(kc: _*).agg(avg("_clipped").as(out))
  }

  /** A8 — daily resample-sum with all-null-stays-null semantics
    * (`/root/reference/scripts/4_merge_data/merge_hourly_standardization.py:216-218`). */
  def sumOrNull(c: Column): Column = when(count(c) === 0, lit(null)).otherwise(sum(c))

  /** A13 — value-resolution inference: mode of successive diffs of the value-sorted
    * series, blended with the median diff, snapped to {1.0, 0.5, 0.1}
    * (`/root/reference/scripts/3_qaqc_data/qaqc_unusual_streaks.py:172-223`).
    * Returns one row per key group with a `resolution` column. */
  def inferResolution(df: DataFrame, keys: Seq[String], valueCol: String): DataFrame = {
    val kc = keys.map(col)
    val w = Window.partitionBy(kc: _*).orderBy(col(valueCol))
    val diffs = df
      .withColumn("_d", col(valueCol) - lag(col(valueCol), 1).over(w))
      .filter(col("_d").isNotNull && col("_d") > 0)
    val counted = diffs.groupBy((keys :+ "_d").map(col): _*).count()
    val mode = counted
      .groupBy(kc: _*)
      .agg(max_by(col("_d"), struct(col("count"), -col("_d"))).as("_mode"))
    val med = diffs.groupBy(kc: _*).agg(expr("percentile(_d, 0.5)").as("_med"))
    val blended = mode.join(med, keys)
      .withColumn("_blend", (col("_mode") + col("_med")) / 2.0)
    blended.withColumn("resolution",
      when(col("_blend") >= 0.75, lit(1.0))
        .when(col("_blend") >= 0.3, lit(0.5))
        .otherwise(lit(0.1)))
      .select((kc :+ col("resolution")): _*)
  }

  /** A14 — time-frequency inference: distribution of successive timestamp deltas,
    * keeping deltas that account for > `minFrac` of rows
    * (`qaqc_unusual_streaks.py:143-169`). */
  def timeDeltaFreqs(df: DataFrame, keys: Seq[String], timeCol: String,
                     minFrac: Double = 0.05): DataFrame = {
    val kc = keys.map(col)
    val w = Window.partitionBy(kc: _*).orderBy(col(timeCol))
    val deltas = df
      .withColumn("delta_s",
        col(timeCol).cast("long") - lag(col(timeCol), 1).over(w).cast("long"))
      .filter(col("delta_s").isNotNull)
    val counted = deltas.groupBy((keys :+ "delta_s").map(col): _*).count()
    val totals = Window.partitionBy(kc: _*)
    counted.withColumn("frac", col("count") / sum(col("count")).over(totals))
      .filter(col("frac") > minFrac)
  }

  /** A17 — per-group internal consistency vote: groups whose distinct (rounded) values
    * exceed 2 and span more than `maxSpan` (`qaqc_wholestation.py:318-392` applied to
    * elevation). Returns offending groups with median + span. */
  def spanConsistency(df: DataFrame, keys: Seq[String], valueCol: String,
                      maxSpan: Double): DataFrame =
    df.groupBy(keys.map(col): _*).agg(
        countDistinct(col(valueCol)).as("n_distinct"),
        (max(col(valueCol)) - min(col(valueCol))).as("span"),
        expr(s"percentile($valueCol, 0.5)").as("median"))
      .filter(col("n_distinct") > 2 && col("span") > maxSpan)
}
