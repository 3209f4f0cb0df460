package graft.graph

import org.apache.spark.sql.functions._
import graft.SparkSpec

class GraphOpsSpec extends SparkSpec {
  import spark.implicits._

  /** Driver-side reference with the op's exact per-round rounding contract. */
  private def refPageRank(edges: Seq[(Long, Long)], iters: Int,
                          d: Double): Map[Long, Double] = {
    def rnd(x: Double): Double =
      new java.math.BigDecimal(java.lang.Double.toString(x))
        .setScale(9, java.math.RoundingMode.HALF_UP).doubleValue()
    val es = edges.distinct
    val nodes = (es.map(_._1) ++ es.map(_._2)).distinct
    val n = nodes.size
    val deg = es.groupBy(_._1).map { case (k, v) => k -> v.size }
    var rank = nodes.map(_ -> rnd(1.0 / n)).toMap
    for (_ <- 1 to iters) {
      val msgs = es.groupBy(_._2).map { case (dst, in) =>
        dst -> in.map(e => BigDecimal(rnd(rank(e._1) / deg(e._1)))).sum
      }
      rank = nodes.map(v =>
        v -> rnd((1.0 - d) / n + d * msgs.getOrElse(v, BigDecimal(0)).toDouble)).toMap
    }
    rank
  }

  test("pageRank: a cycle stays uniform at every iteration count") {
    val cyc = Seq((1L, 2L), (2L, 3L), (3L, 1L)).toDF("s", "d")
    val r = GraphOps.pageRank(cyc, "s", "d", iterations = 5)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(r.size == 3)
    assert(r.values.forall(v => math.abs(v - 1.0 / 3) < 1e-8), r.toString)
  }

  test("pageRank matches the rounding-faithful reference on a dense pseudo-random graph") {
    val edges = (for { u <- 1 to 30; k <- 1 to 3 }
      yield (u.toLong, ((u * 7 + k * 11) % 30 + 1).toLong)).distinct
    val got = GraphOps.pageRank(edges.toDF("s", "d"), "s", "d", iterations = 4)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val exp = refPageRank(edges, 4, 0.85)
    assert(got.keySet == exp.keySet)
    exp.foreach { case (node, v) =>
      assert(got(node) == v, s"node $node: got ${got(node)}, expected $v") }
    // a sink-heavy graph loses mass (dangling contract): sum < 1
    val sink = Seq((1L, 9L), (2L, 9L), (3L, 9L)).toDF("s", "d")
    val total = GraphOps.pageRank(sink, "s", "d", iterations = 3)
      .agg(sum(col("rank"))).head().getDouble(0)
    assert(total < 1.0)
  }

  test("pageRank plan: N rides a broadcast, never a cartesian product") {
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L)).toDF("s", "d")
    val plan = GraphOps.pageRank(edges, "s", "d", iterations = 3)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"),
      s"the 1-row N cross join must broadcast:\n$plan")
    assert(plan.contains("BroadcastNestedLoopJoin") || plan.contains("BroadcastHashJoin"),
      s"expected a broadcast for the scalar N:\n$plan")
  }
}
