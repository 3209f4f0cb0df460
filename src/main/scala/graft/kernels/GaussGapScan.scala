package graft.kernels

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** W13 — Gaussian-fit distribution gap scan, flag 26 (`flag_clim_outliers` +
  * `fit_normal` + `gap_search`,
  * `/root/reference/scripts/3_qaqc_data/qaqc_climatological_outlier.py:250-460`).
  *
  * Per (series, month, hour) group of standardized, low-passed anomalies:
  *  1. symmetric histogram around 0 with `binSize` bins spanning ±max|value|;
  *  2. fit N(mu, sigma) (population moments, as numpy norm.fit);
  *  3. pdf evaluated at bin EDGES, scaled by the histogram area; the central region is
  *     [last rising edge with p<=0.1 … first falling edge with p<=0.1] (fallbacks 1 and
  *     len-2 as the reference);
  *  4. scanning outward from those bounds, the first bin with count < 0.1 "reds" every
  *     bin beyond it (gap_search); values at or beyond the outermost red bin edge are
  *     red, values beyond the yellow threshold are yellow; both flag 26.
  *
  * Spark shape: groups are SMALL (≤ a few hundred histogram bins; values per group
  * bounded by one month × hour of one station) → `collect_list` per group into a
  * `mapGroups`-style aggregation is safe; the scan itself is plain Scala. Groups with
  * ≤ `minN` values are bypassed (reference: 5).
  */
object GaussGapScan {

  /** Pure kernel on one group's values: returns the indices of flagged values. */
  def flagOutliers(values: Array[Double], binSize: Double = 0.25, minN: Int = 5): Array[Int] = {
    val n = values.length
    if (n <= minN) return Array.empty
    val maxAbs = {
      // reference create_bins: floor(min)..ceil(max); then symmetrized to ±max|bin|
      val bMin = math.floor(values.min)
      val bMax = math.ceil(values.max) + binSize
      math.max(math.abs(bMin), math.abs(bMax))
    }
    // bins = arange(-maxAbs - binSize, maxAbs + 2*binSize, binSize) — edge array
    val nEdges = math.max(((maxAbs + 2 * binSize) - (-maxAbs - binSize)) / binSize, 1).toInt
    val edges = Array.tabulate(nEdges)(i => -maxAbs - binSize + i * binSize)
    if (edges.length < 4) return Array.empty
    val nBins = edges.length - 1
    val freq = new Array[Double](nBins)
    values.foreach { v =>
      // np.histogram: right-inclusive last bin
      var b = ((v - edges(0)) / binSize).toInt
      if (b == nBins && v <= edges.last + 1e-12) b = nBins - 1
      if (b >= 0 && b < nBins) freq(b) += 1
    }
    val area = binSize * freq.sum
    val mu = values.sum / n
    val sigma = math.sqrt(values.map(v => (v - mu) * (v - mu)).sum / n)
    val p: Array[Double] =
      if (sigma == 0 || sigma.abs < 1e-12) new Array[Double](edges.length)
      else edges.map(x =>
        area * math.exp(-(x - mu) * (x - mu) / (2 * sigma * sigma)) / (sigma * math.sqrt(2 * math.Pi)))
    // np.gradient central differences (uniform spacing): g(i) = (p(i+1)-p(i-1))/2,
    // one-sided at the ends
    def grad(i: Int): Double =
      if (i == 0) p(1) - p(0)
      else if (i == p.length - 1) p(i) - p(i - 1)
      else (p(i + 1) - p(i - 1)) / 2.0
    val leftCandidates = p.indices.filter(i => grad(i) > 0 && p(i) <= 0.1)
    val left = if (leftCandidates.nonEmpty) leftCandidates.last else 1
    val rightCandidates = p.indices.filter(i => grad(i) < 0 && p(i) <= 0.1)
    val right = if (rightCandidates.nonEmpty) rightCandidates.head else edges.length - 2
    // gap_search over freq (bin counts): left tail = freq[0:left], right tail = freq[right+1:]
    val flag = Array.fill(nBins)(1.0)
    for (i <- 0 until math.min(left, nBins)) flag(i) = 0.0
    var i = math.min(left, nBins) - 1
    var found = false
    while (i >= 0 && !found) { // scan from just inside the tail outward (reference reversed loop)
      if (freq(i) < 0.1) { for (j <- 0 to i) flag(j) = -1.0; found = true }
      i -= 1
    }
    for (i <- (right + 1) until nBins) flag(i) = 0.0
    var k = right + 1
    found = false
    while (k < nBins && !found) {
      if (freq(k) < 0.1) { for (j <- k until nBins) flag(j) = -1.0; found = true }
      k += 1
    }
    // freq_bins: the reference's per-bin threshold values — interior bin edges with the
    // two central entries zeroed (freq_bins = concat(bins[1:mid], [0,0], bins[mid+1:-1]))
    val mid = edges.length / 2
    val freqBins: Array[Double] =
      (edges.slice(1, mid) ++ Array(0.0, 0.0) ++ edges.slice(mid + 1, edges.length - 1))
    val fb = freqBins.take(nBins)
    def maxOr(xs: Seq[Double], default: Double): Double = if (xs.nonEmpty) xs.max else default
    def minOr(xs: Seq[Double], default: Double): Double = if (xs.nonEmpty) xs.min else default
    val leftBad = fb.indices.filter(i => flag(i) == -1.0 && fb(i) < 0).map(fb)
    val rightBad = fb.indices.filter(i => flag(i) == -1.0 && fb(i) > 0).map(fb)
    val leftProb = fb.indices.filter(i => flag(i) == 0.0 && fb(i) < 0).map(fb)
    val rightProb = fb.indices.filter(i => flag(i) == 0.0 && fb(i) > 0).map(fb)
    values.indices.filter { vi =>
      val v = values(vi)
      val redL = leftBad.nonEmpty && v <= maxOr(leftBad, Double.NegativeInfinity)
      val redR = rightBad.nonEmpty && v >= maxOr(rightBad, Double.PositiveInfinity)
      val yelL = leftProb.nonEmpty && v <= maxOr(leftProb, Double.NegativeInfinity) && !redL
      val yelR = rightProb.nonEmpty && v >= minOr(rightProb, Double.PositiveInfinity) && !redR
      redL || redR || yelL || yelR
    }.toArray
  }

  /** Distributed application: per key group, collect (time, value), run the scan, and
    * return flagged (keys..., time) rows. Group cardinality is bounded by (station,
    * month, hour) — ≤ ~1300 values for 43 years of hourly data.
    *
    * Output columns are the original key names (string-typed; null components
    * round-trip as null) plus `t_s` (epoch seconds). Grouping is by the key *tuple*,
    * so ("a", null) and ("a", "") never collide. */
  def flagged(df: DataFrame, keys: Seq[String], timeCol: String, valueCol: String,
              binSize: Double = 0.25)(implicit spark: SparkSession): DataFrame = {
    import spark.implicits._
    val nullTag = "\u0000null"
    val kc = keys.map(c => coalesce(col(c).cast("string"), lit(nullTag)))
    df.filter(col(valueCol).isNotNull)
      .select(array(kc: _*).as("_ks"),
        col(timeCol).cast("long").as("_t"), col(valueCol).cast("double").as("_v"))
      .as[(Seq[String], Long, Double)]
      .groupByKey(_._1)
      .flatMapGroups { (k, it) =>
        val rows = it.toArray.sortBy(_._2)
        val idx = flagOutliers(rows.map(_._3), binSize)
        idx.iterator.map(i => (k, rows(i)._2))
      }
      .toDF("_ks", "t_s")
      .select(keys.zipWithIndex.map { case (n, i) =>
        when(col("_ks")(i) === nullTag, lit(null)).otherwise(col("_ks")(i)).as(n)
      } :+ col("t_s"): _*)
  }
}
