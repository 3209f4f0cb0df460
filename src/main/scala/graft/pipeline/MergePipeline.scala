package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.ops.{AggOps, SeriesOps}

/** §3.2 — the merge pipeline (`run_merge_one_station`,
  * `/root/reference/scripts/4_merge_data/MERGE_pipeline.py:471-570`): derive missing
  * variables → hourly standardization → gap infill → column pruning, as one lazy plan.
  *
  * The reference's four per-kind pandas resamples + outer-merge reassembly (J7)
  * collapse into a single `groupBy(station, hour)` with mixed aggregate expressions —
  * the join disappears (SURVEY §2.3 J7).
  */
object MergePipeline {

  /** Hourly standardization (`merge_hourly_standardization.py:97-248`): instantaneous
    * variables take the first non-null value of the hour, accumulating variables sum
    * (all-null hour stays null), flag strings concat distinct, constants take first.
    * One shuffle on (keys, hour). */
  def hourlyStandardize(df: DataFrame, keys: Seq[String], timeCol: String,
                        instantCols: Seq[String], sumCols: Seq[String],
                        flagCols: Seq[String], constCols: Seq[String],
                        tiebreak: Column): DataFrame = {
    val hour = date_trunc("HOUR", col(timeCol)).as("hour_ts")
    def firstNonNull(v: String): Column =
      min_by(col(v), when(col(v).isNotNull, struct(col(timeCol), tiebreak))).as(v)
    val aggs =
      instantCols.map(firstNonNull) ++
        sumCols.map(v => AggOps.sumOrNull(col(v)).as(v)) ++
        flagCols.map(v => SeriesOps.flagConcat(col(v).cast("string")).as(v)) ++
        constCols.map(v => first(col(v), ignoreNulls = true).as(v))
    df.groupBy((keys.map(col) :+ hour): _*).agg(aggs.head, aggs.tail: _*)
  }

  /** Full merge: derive → hourly standardize → infill missing hours (marked
    * `standardized_infill='y'`, constants forward-filled) → prune. */
  def run(df: DataFrame, keys: Seq[String], timeCol: String,
          instantCols: Seq[String], sumCols: Seq[String], flagCols: Seq[String],
          constCols: Seq[String], tiebreak: Column,
          keepSubstrings: Seq[String], dropSubstrings: Seq[String]): DataFrame = {
    val derived = DeriveDag.deriveMissing(df)
    val hourly = hourlyStandardize(derived, keys, timeCol,
      instantCols.filter(derived.columns.contains),
      sumCols.filter(derived.columns.contains),
      flagCols.filter(derived.columns.contains),
      constCols.filter(derived.columns.contains), tiebreak)
    val infilled = SeriesOps.gapInfill(hourly, keys, "hour_ts")
    val filled = constCols.filter(infilled.columns.contains).foldLeft(infilled) { (d, c) =>
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(keys.map(col): _*).orderBy(col("hour_ts"))
        .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
      d.withColumn(c, coalesce(col(c), last(col(c), ignoreNulls = true).over(w)))
    }
    graft.ops.ColumnGates.pruneColumns(filled,
      keepSubstrings ++ keys :+ "hour_ts" :+ "standardized_infill", dropSubstrings)
  }
}
