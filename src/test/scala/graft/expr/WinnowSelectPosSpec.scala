package graft.expr

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Pins [[WinnowSelectPos]]: value-set parity with [[WinnowSelect]], positional
  * correctness (each struct is a window minimum at its position), and
  * codegen/interpreted agreement. */
class WinnowSelectPosSpec extends SparkSpec {
  import spark.implicits._

  test("value multiset matches WinnowSelect; positions index their values") {
    val rng = new scala.util.Random(23)
    val rows: Seq[(Long, Seq[Long])] =
      (1 to 60).map(i => (i.toLong, Seq.fill(2 + rng.nextInt(60))(rng.nextLong()))) ++
        Seq((101L, Seq.empty[Long]), (102L, Seq(7L)))
    for (w <- Seq(1, 4, 31)) {
      val df = rows.toDF("id", "h")
        .withColumn("flat", WinnowSelect.expr(col("h"), w))
        .withColumn("posed", WinnowSelectPos.expr(col("h"), w))
      df.select("h", "flat", "posed").collect().foreach { r =>
        val h = r.getSeq[Long](0)
        val flat = r.getSeq[Any](1).filter(_ != null).map(_.asInstanceOf[Long]).toSet
        val posed = r.getSeq[Row](2).map(s => (s.getLong(0), s.getInt(1)))
        // same selected VALUES (positional keeps per-position dups; flat dedups)
        assert(posed.map(_._1).toSet == flat)
        // every (fp, pos) indexes its own value
        posed.foreach { case (fp, pos) => assert(h(pos) == fp) }
        // positions strictly increase (sorted, deduped)
        assert(posed.map(_._2) == posed.map(_._2).distinct.sorted)
      }
    }
  }

  test("distinct-value selection: each struct is the min of some width-w window") {
    val h = Seq(9L, 4L, 7L, 1L, 8L, 6L, 2L, 5L)
    val w = 3
    val posed = Seq((1L, h)).toDF("id", "h")
      .select(WinnowSelectPos.expr(col("h"), w)).collect()(0)
      .getSeq[Row](0).map(s => (s.getLong(0), s.getInt(1)))
    posed.foreach { case (fp, pos) =>
      val isMinOfSomeWindow = (0 to h.length - w).exists { s =>
        pos >= s && pos < s + w && h.slice(s, s + w).min == fp
      }
      assert(isMinOfSomeWindow, s"($fp,$pos)")
    }
    // the global min is always selected
    assert(posed.exists(_._1 == 1L))
  }

  test("codegen and interpreted paths agree") {
    val df = Seq((1L, Seq(9L, 1L, 8L, 2L, 7L, 3L)), (2L, Seq(5L)),
      (3L, Seq.empty[Long])).toDF("id", "h")
    spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    val interp = df.select(WinnowSelectPos.expr(col("h"), 3)).collect()
      .map(_.getSeq[Row](0).map(s => (s.getLong(0), s.getInt(1)))).toSeq
    spark.conf.set("spark.sql.codegen.factoryMode", "FALLBACK")
    val gen = df.select(WinnowSelectPos.expr(col("h"), 3)).collect()
      .map(_.getSeq[Row](0).map(s => (s.getLong(0), s.getInt(1)))).toSeq
    assert(interp == gen)
  }
}
