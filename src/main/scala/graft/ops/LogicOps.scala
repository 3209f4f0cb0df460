package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.core.Flags

/** Cross-variable logic checks, flags 10–18
  * (`/root/reference/scripts/3_qaqc_data/qaqc_logic_checks.py`). All pure `when`
  * expressions over already-set flag columns — zero shuffles, whole-stage codegen.
  *
  * Every check is `validObs`-gated on its inputs (`grab_valid_obs` semantics): rows
  * already red-flagged for an input variable are not re-examined.
  */
object LogicOps {

  private def valid(flagCol: Column): Column = CleanOps.validObs(flagCol)

  /** Flag 10 — negative precipitation (`qaqc_precip_logic_nonegvals`,
    * `qaqc_logic_checks.py:154-208`). */
  def flagNegative(df: DataFrame, valueCol: String, flagColName: String): DataFrame =
    df.withColumn(flagColName,
      when(valid(col(flagColName)) && col(valueCol) < 0,
        lit(Flags.NegativePrecip).cast("int")).otherwise(col(flagColName)))

  /** Flag 12 — supersaturation: dewpoint exceeds air temperature; only the dewpoint is
    * flagged (`qaqc_crossvar_logic_tdps_to_tas_supersat`, `qaqc_logic_checks.py:28-77`). */
  def flagSupersaturation(df: DataFrame, tdpsCol: String, tasCol: String,
                          tdpsFlagColName: String, tasFlagCol: Column): DataFrame =
    df.withColumn(tdpsFlagColName,
      when(valid(col(tdpsFlagColName)) && valid(tasFlagCol) &&
        col(tdpsCol) > col(tasCol),
        lit(Flags.Supersaturation).cast("int")).otherwise(col(tdpsFlagColName)))

  /** Flags 14/15 — calm-wind direction consistency
    * (`qaqc_crossvar_logic_calm_wind_dir`, `qaqc_logic_checks.py:311-372`):
    * speed 0 with nonzero direction → 14; nonzero speed with direction 0 → direction
    * recoded to 360 (true north) and flagged 15. */
  def flagCalmWindDir(df: DataFrame, windCol: String, dirCol: String,
                      dirFlagColName: String, windFlagCol: Column): DataFrame = {
    val ok = valid(col(dirFlagColName)) && valid(windFlagCol)
    // stage the predicates before mutating either column: the second withColumn must
    // not see the first one's updates
    df.withColumn("_b14",
        ok && col(windCol) === 0 && col(dirCol) =!= 0 && col(dirCol).isNotNull)
      .withColumn("_b15", ok && col(windCol) =!= 0 && col(dirCol) === 0)
      .withColumn(dirFlagColName,
        when(col("_b14"), lit(Flags.CalmWindBadDir).cast("int"))
          .when(col("_b15"), lit(Flags.CalmWindZeroDir).cast("int"))
          .otherwise(col(dirFlagColName)))
      .withColumn(dirCol, when(col("_b15"), 360.0).otherwise(col(dirCol)))
      .drop("_b14", "_b15")
  }

  /** Flags 16/17/18 — precipitation accumulation-window consistency
    * (`qaqc_precip_logic_accum_amounts`, `qaqc_logic_checks.py:211-308`): a shorter
    * accumulation window must not exceed a longer one. `flag` selects 16 (short side
    * too large), 17 (long side too small) or 18 (24h below since-local-midnight).
    * The reference's `.index` on an unfiltered boolean series would flag every valid
    * row; we implement the documented comparison intent. */
  def flagAccumWindow(df: DataFrame, shortCol: String, longCol: String,
                      flagColName: String, shortFlagCol: Column, longFlagCol: Column,
                      flag: Int): DataFrame =
    df.withColumn(flagColName,
      when(valid(shortFlagCol) && valid(longFlagCol) &&
        col(shortCol) > col(longCol),
        lit(flag).cast("int")).otherwise(col(flagColName)))
}
