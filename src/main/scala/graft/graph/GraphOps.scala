package graft.graph

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Link-graph operators for corpus curation. Web-curation pipelines rank hosts
  * and documents by link structure (Common-Crawl-style host ranks feed quality
  * gates the same way Gopher rules do); the canonical primitive is PageRank
  * (Page et al. 1999). No reference counterpart — a green-field addition in the
  * dedup/ann/text quadrant's spirit.
  */
object GraphOps {

  /** Fixed-iteration PageRank over a simple directed graph.
    *
    * Semantics: `rank_0 = 1/N`; each round,
    * `rank_{i+1}(v) = (1-damping)/N + damping * Σ_{u→v} rank_i(u)/outdeg(u)`.
    * Duplicate edges are collapsed (simple graph); dangling nodes (no
    * out-edges) contribute no mass — ranks then sum to < 1, the standard
    * "lost mass" formulation (documented; the redistribute variant adds a
    * scalar per round and changes no ordering).
    *
    * Exactness: per-edge contributions are rounded to 9dp decimals and summed
    * as decimals (order-independent), and each round's rank is re-rounded to
    * 9dp — every iteration is bit-portable, so the op carries an exact SQL
    * oracle with the rounds unrolled as CTEs (the t13 rule, applied per
    * iteration).
    *
    * Scale shape: out-degrees are computed ONCE; each iteration is one
    * rank⨝edges shuffle join on the source key plus one partial-agg groupBy on
    * the destination — the classic Pregel message shape expressed relationally.
    * `iterations` is a small constant, so the whole computation is ONE lazy
    * plan (no driver loop, no actions, no lineage blow-up at 5 rounds);
    * node/edge tables stay distributed throughout, and the only scalar (N)
    * rides a 1-row broadcast cross join. */
  def pageRank(edgesRaw: DataFrame, srcCol: String, dstCol: String,
               iterations: Int = 5, damping: Double = 0.85): DataFrame = {
    // r15 optimization round: the distinct() leaves the cached edge table
    // hashpartitioned on (src, dst), but every one of the `iterations` rounds
    // joins edges on src — each round re-shuffled the FULL edge set (the
    // corpus-sized side of PageRank) to src partitioning. One explicit
    // repartition(src) at build time gives the cache the partitioning the
    // loop actually consumes: the per-round edge exchange disappears (plan
    // audit: plans/r15/g1_pagerank_*; the outDeg groupBy(src) shares it too),
    // so per round only the node-sized rank table moves. Results unchanged —
    // partitioning only (order-independent decimal message sums).
    val edges = edgesRaw
      .select(col(srcCol).as("src"), col(dstCol).as("dst"))
      .filter(col("src").isNotNull && col("dst").isNotNull)
      .distinct()
      .repartition(col("src"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val nodes = edges.select(col("src").as("node"))
      .unionByName(edges.select(col("dst").as("node")))
      .distinct()
    val nn = nodes.agg(count(lit(1)).as("n_nodes"))
    val outDeg = edges.groupBy(col("src")).agg(count(lit(1)).as("deg"))

    val base = nodes.crossJoin(broadcast(nn))
    var ranks = base.select(col("node"), col("n_nodes"),
      round(lit(1.0) / col("n_nodes"), 9).as("rank"))
    for (_ <- 1 to iterations) {
      val msgs = edges
        .join(ranks.select(col("node").as("src"), col("rank")), "src")
        .join(outDeg, "src")
        .groupBy(col("dst").as("node"))
        .agg(sum(round(col("rank") / col("deg"), 9).cast("decimal(28,9)")).as("_m"))
      ranks = base
        .join(msgs, Seq("node"), "left")
        .select(col("node"), col("n_nodes"),
          // (1-d) as a COLUMN subtraction: both engines then compute the same
          // IEEE double (a Scala-side `1 - 0.85` constant-folds differently
          // than DuckDB's decimal literal arithmetic would)
          round((lit(1.0) - lit(damping)) / col("n_nodes") +
            lit(damping) * coalesce(col("_m").cast("double"), lit(0.0)), 9)
            .as("rank"))
    }
    ranks.select(col("node"), col("rank"))
  }
}
