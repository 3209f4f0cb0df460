package graft.ops

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

/** P6/P7/P8 — column-level gates and pruning
  * (`/root/reference/scripts/3_qaqc_data/qaqc_wholestation.py:56-110`,
  * `/root/reference/scripts/4_merge_data/merge_clean_vars.py:21-97`,
  * `/root/reference/scripts/2_clean_data/MADIS_clean.py:312`).
  *
  * The reference discovers columns per station file; our schema is global, so
  * "column presence" = having any non-null value, computed with ONE aggregation over
  * the whole table (a handful of longs per column — no per-row work downstream).
  */
object ColumnGates {

  /** P6 — eligible-variables gate: of `candidates`, the columns with ≥1 non-null value
    * (`qaqc_eligible_vars`). Stations whose candidate set is empty are skipped by the
    * caller. Single job, single row collected. */
  def eligibleVariables(df: DataFrame, candidates: Seq[String]): Seq[String] = {
    val present = candidates.filter(df.columns.contains)
    if (present.isEmpty) return Seq.empty
    val row: Row = df.agg(
      count(col(present.head)).as(present.head),
      present.tail.map(c => count(col(c)).as(c)): _*).head()
    present.filter(c => row.getAs[Long](c) > 0)
  }

  /** P7 — final-product column pruning (`filter_columns`): keep columns matching any
    * `keepSubstrings`, then drop those matching any `dropSubstrings` — the reference's
    * substring keep/drop lists re-expressed as one `select`. */
  def pruneColumns(df: DataFrame, keepSubstrings: Seq[String],
                   dropSubstrings: Seq[String]): DataFrame = {
    val keep = df.columns.filter { c =>
      keepSubstrings.exists(c.contains) && !dropSubstrings.exists(c.contains)
    }
    df.select(keep.map(col): _*)
  }

  /** P8 — drop all-null columns (`df.dropna(axis=1, how="all")`): one aggregation for
    * the non-null counts, then a select of survivors. */
  def dropAllNullColumns(df: DataFrame, candidates: Seq[String]): DataFrame = {
    val present = candidates.filter(df.columns.contains)
    if (present.isEmpty) return df
    val row = df.agg(
      count(col(present.head)).as(present.head),
      present.tail.map(c => count(col(c)).as(c)): _*).head()
    val dead = present.filter(c => row.getAs[Long](c) == 0)
    df.drop(dead: _*)
  }
}
