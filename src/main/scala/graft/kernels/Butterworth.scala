package graft.kernels

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** W11 — first-order Butterworth low-pass over per-series standardized anomalies
  * (`/root/reference/scripts/3_qaqc_data/qaqc_climatological_outlier.py:148-177`):
  * `signal.butter(1, cutFreq, 'lp', fs=dataFreq)` + `sosfilt`, the reference's only
  * inherently-sequential kernel.
  *
  * Spark shape: `Dataset.groupByKey(seriesKey).flatMapGroups` over the time-sorted
  * iterator — the one operator family SQL can't express. The IIR state is two doubles;
  * rows STREAM through the kernel (no per-station materialization), so a station's
  * series can be arbitrarily long at 100 TB. The required secondary sort is obtained by
  * `repartition(key).sortWithinPartitions(key, time)` before `mapPartitions`.
  */
object Butterworth {

  /** Bilinear-transform coefficients of the 1st-order Butterworth low-pass:
    * K = tan(pi*fc/fs); b0 = b1 = K/(K+1); a1 = (K-1)/(K+1). Matches
    * scipy.signal.butter(1, fc, 'lp', fs=fs) exactly (same prewarped bilinear
    * transform, Oppenheim & Schafer §7.1). */
  final case class Coeffs(b0: Double, b1: Double, a1: Double)

  def coeffs(cutFreq: Double, dataFreq: Double): Coeffs = {
    val wn = cutFreq / (dataFreq / 2.0)
    require(wn > 0 && wn < 1, s"cutoff must be below Nyquist (Wn=$wn)")
    val k = math.tan(math.Pi * wn / 2.0)
    Coeffs(k / (k + 1.0), k / (k + 1.0), (k - 1.0) / (k + 1.0))
  }

  /** Direct-form difference equation y[n] = b0 x[n] + b1 x[n-1] - a1 y[n-1] with zero
    * initial conditions (scipy sosfilt default). Pure streaming fold. */
  def filterSeries(xs: Iterator[Double], c: Coeffs): Iterator[Double] = {
    var xp = 0.0
    var yp = 0.0
    var first = true
    xs.map { x =>
      val y = if (first) { first = false; c.b0 * x }
              else c.b0 * x + c.b1 * xp - c.a1 * yp
      xp = x; yp = y
      y
    }
  }

  /** The reference's one-month cutoff frequency in Hz (`cut_period = 1 month`). */
  val OneMonthCutoffHz: Double = 1.0 / (3600.0 * 24.0 * 365.0 / 30.0)

  /** Distributed application: per key group, linear interpolation of the value column
    * is the caller's job (SeriesOps.interpolateLinear, as the reference interpolates
    * before filtering); here we sort within partitions by (keys, time) after a
    * repartition on keys and stream each group through the IIR. `dataFreqSeconds` is
    * the per-series mode of time deltas (A14) — pass the joined column name. */
  def lowPass(df: DataFrame, keys: Seq[String], timeCol: String, valueCol: String,
              dataFreqSecondsCol: String, out: String,
              cutFreq: Double = OneMonthCutoffHz)(implicit spark: SparkSession): DataFrame = {
    import spark.implicits._
    val keyCols = keys.map(col)
    // null-safe composite key: coalesce each component so ("a", null) and ("a", "")
    // cannot collide (concat_ws silently skips nulls), with escaped control chars so
    // the source file stays plain text
    val keyExpr = concat_ws("\u0001",
      keys.map(c => coalesce(col(c).cast("string"), lit("\u0002null"))): _*)
    val prepared = df
      .filter(col(valueCol).isNotNull && col(dataFreqSecondsCol).isNotNull)
      .repartition(keyCols: _*)
      .sortWithinPartitions((keyCols :+ col(timeCol)): _*)
      .select(keyExpr.as("_k"),
        col(timeCol).cast("long").as("_t"),
        col(valueCol).cast("double").as("_v"),
        col(dataFreqSecondsCol).cast("double").as("_dt"))
      .as[(String, Long, Double, Double)]
    val filtered = prepared.mapPartitions { it =>
      // partition is sorted by (key, time): detect group boundaries on the fly and
      // keep only two doubles of IIR state per group — true streaming
      var curKey: String = null
      var c: Coeffs = null
      var xp = 0.0; var yp = 0.0; var first = true
      it.map { case (k, t, v, dt) =>
        if (k != curKey) {
          curKey = k
          c = coeffs(cutFreq, 1.0 / dt)
          xp = 0.0; yp = 0.0; first = true
        }
        val y = if (first) { first = false; c.b0 * v }
                else c.b0 * v + c.b1 * xp - c.a1 * yp
        xp = v; yp = y
        (k, t, y)
      }
    }.toDF("_k", "_t", out)
    // join-back: dedupe the filtered side on (_k, _t) first — an IIR over duplicate
    // timestamps is ill-defined, so duplicates share one filtered value instead of
    // multiplying rows through the join; LEFT join so rows the kernel never saw
    // (null value / null freq, filtered above) survive with a null `out`
    df.withColumn("_k", keyExpr)
      .withColumn("_t", col(timeCol).cast("long"))
      .join(filtered.dropDuplicates("_k", "_t"), Seq("_k", "_t"), "left")
      .drop("_k", "_t")
  }
}
