package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.expr.Derive

/** §2.8 — conditional derived-variable DAG (`merge_derive_missing_vars`,
  * `/root/reference/scripts/4_merge_data/merge_derive_missing.py:41-174`):
  * derive dewpoint / relative humidity / air temperature whenever the target is absent
  * but its inputs are present, each derived column carrying a `_eraqc` shadow set to 38
  * (synergistic) wherever any input row was flagged (`derive_synergistic_flag`,
  * `merge_derive_missing.py:202-250`).
  *
  * Presence is schema-level (the reference's per-station column discovery maps to our
  * global schema); all additions are `withColumn` expressions — no shuffle, no UDF.
  */
object DeriveDag {

  private def has(df: DataFrame, c: String): Boolean = df.columns.contains(c)
  private def flagOf(df: DataFrame, v: String) =
    if (has(df, v + "_eraqc")) col(v + "_eraqc") else lit(null).cast("int")

  def deriveMissing(df: DataFrame): DataFrame = {
    var out = df
    // tdps_derived from (tas, hurs)
    if (!has(out, "tdps") && has(out, "tas") && has(out, "hurs")) {
      out = out
        .withColumn("tdps_derived", Derive.dewpointFromTasHurs(col("tas"), col("hurs")))
        .withColumn("tdps_derived_eraqc",
          Derive.synergisticFlag(flagOf(out, "tas"), flagOf(out, "hurs")))
    }
    // hurs_derived from (tas, tdps or tdps_derived)
    if (!has(out, "hurs") && has(out, "tas") &&
      (has(out, "tdps") || has(out, "tdps_derived"))) {
      val td = if (has(out, "tdps")) "tdps" else "tdps_derived"
      out = out
        .withColumn("hurs_derived", Derive.relhumid(col("tas"), col(td)))
        .withColumn("hurs_derived_eraqc",
          Derive.synergisticFlag(flagOf(out, "tas"), flagOf(out, td)))
    }
    // tas_derived from (hurs, tdps or tdps_derived)
    if (!has(out, "tas") && has(out, "hurs") &&
      (has(out, "tdps") || has(out, "tdps_derived"))) {
      val td = if (has(out, "tdps")) "tdps" else "tdps_derived"
      out = out
        .withColumn("tas_derived", Derive.airtempFromHursTdps(col("hurs"), col(td)))
        .withColumn("tas_derived_eraqc",
          Derive.synergisticFlag(flagOf(out, "hurs"), flagOf(out, td)))
    }
    out
  }
}
