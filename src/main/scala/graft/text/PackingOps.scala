package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing for LLM pretraining: documents are (conceptually) concatenated in
  * a deterministic order and chunked into fixed token-budget context windows; each
  * document is assigned the window its first token lands in, its offset within that
  * window, and how many windows it spans (the concat-and-chunk convention — documents
  * MAY straddle window boundaries; greedy no-split packing is a different trade-off
  * that needs sequential state).
  *
  * Deterministic and engine-portable: the assignment depends only on (stratum, id
  * order, token counts) — never on partitioning — so packs are stable across runs,
  * engines, and incremental corpus growth within a stratum prefix. One shuffle on the
  * stratum keys; the running sum is partition-local. Token totals per stratum stay
  * exact in double arithmetic below 2^53 tokens (~9 petatokens) — far beyond any
  * corpus; offsets use exact integer pmod.
  */
object PackingOps {

  /** Adds `pack_id` (0-based window index of the document's first token),
    * `pack_offset` (token offset within that window) and `n_packs` (windows the
    * document touches; 1 for empty documents) per stratum `keys`, ordering documents
    * by `idCol`, with `budget` tokens per window. `nTokCol` is the per-document token
    * count (precomputed — callers choose their tokenizer). */
  def chunkPackAssign(df: DataFrame, keys: Seq[String], idCol: String, nTokCol: String,
                      budget: Long): DataFrame = {
    require(budget > 0, "budget must be positive")
    val w = Window.partitionBy(keys.map(col): _*).orderBy(col(idCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    val cb = coalesce(sum(col(nTokCol)).over(w), lit(0L))
    val n = col(nTokCol)
    df.withColumn("pack_offset", pmod(cb, lit(budget)))
      .withColumn("pack_id", ((cb - col("pack_offset")) / budget).cast("long"))
      .withColumn("n_packs",
        when(n <= 0, lit(1L))
          .otherwise(floor((cb + n - 1) / budget).cast("long") - col("pack_id") + 1))
  }
}
