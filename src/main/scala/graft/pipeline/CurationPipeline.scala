package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.text.TextOps

/** End-to-end training-data curation funnel — the LLM-quadrant analog of
  * QaqcPipeline: quality gate → language gate → exact dedup → stratified sampling,
  * each stage consuming the previous stage's verdict (a document dropped by quality
  * never competes for a dedup slot or a sample budget).
  *
  * The whole funnel is ONE annotate pass (scan-local expressions + one window over
  * the fingerprint + one final aggregate): no stage materializes an intermediate
  * corpus, so at 100 TB the cost is a single scan, one hash-shuffle on the
  * fingerprint, and a one-row result. Every decision is deterministic and
  * engine-portable (md5-routed), so the funnel has an exact SQL oracle and a
  * curation run can be audited document-by-document.
  */
object CurationPipeline {

  final case class Config(
      minQuality: Double = 0.55,
      markers: Map[String, Seq[String]] = TextOps.DefaultLangMarkers,
      rates: Map[String, Double] = Map.empty,
      defaultRate: Double = 0.1,
      salt: String = "samp:")

  /** Per-document stage verdicts: adds `quality`, `det` (detected language) and the
    * cumulative booleans `keep_quality`/`keep_lang`/`keep_dedup`/`keep_sample`.
    * Dedup keeps the smallest id among LANG-SURVIVING members of each normalized-text
    * fingerprint group (survivors order first in the window, so a dropped doc never
    * shadows a surviving duplicate). */
  def annotate(docs: DataFrame, idCol: String, textCol: String, cfg: Config): DataFrame = {
    val keepQ = col("quality") >= cfg.minQuality
    val keepL = keepQ && col("det") =!= "und"
    val fp = TextOps.fingerprint(col(textCol))
    // lang-survivors first, then smallest id — rank 1 == canonical representative
    val w = Window.partitionBy(fp).orderBy(keepL.desc, col(idCol))
    docs
      .withColumn("quality", TextOps.qualityScore(col(textCol)))
      .withColumn("det", TextOps.langIdLite(col(textCol), cfg.markers))
      .withColumn("keep_quality", keepQ)
      .withColumn("keep_lang", keepL)
      .withColumn("keep_dedup", keepL && row_number().over(w) === 1)
      .withColumn("keep_sample", col("keep_dedup") &&
        TextOps.stratifiedSampleFlag(col(idCol), col("det"), cfg.rates,
          cfg.defaultRate, cfg.salt))
  }

  /** One-row funnel: total and survivors after each stage. */
  def funnel(annotated: DataFrame): DataFrame =
    annotated.agg(
      count(lit(1)).as("n_total"),
      sum(col("keep_quality").cast("long")).as("n_quality"),
      sum(col("keep_lang").cast("long")).as("n_lang"),
      sum(col("keep_dedup").cast("long")).as("n_dedup"),
      sum(col("keep_sample").cast("long")).as("n_sample"))
}
