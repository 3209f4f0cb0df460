package graft.expr

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Pins [[WinnowSelect]] to the slice/array_min HOF chain it replaced, and
  * codegen to interpreted. */
class WinnowSelectSpec extends SparkSpec {
  import spark.implicits._

  private def hofSelect(h: org.apache.spark.sql.Column, w: Int): org.apache.spark.sql.Column = {
    // the pre-r8 winnowingFingerprints selection
    val sel = when(size(h) <= w, array(array_min(h)))
      .otherwise(transform(sequence(lit(1), size(h) - w + 1),
        i => array_min(slice(h, i, lit(w)))))
    array_sort(array_distinct(sel))
  }

  test("bit-identical to the HOF formulation across sizes, dups, and nulls") {
    val rng = new scala.util.Random(17)
    val rows: Seq[(Long, Seq[java.lang.Long])] =
      (1 to 80).map { i =>
        // duplicate-heavy values so distinct/dedupe paths are exercised
        (i.toLong, Seq.fill(rng.nextInt(70))(java.lang.Long.valueOf(rng.nextInt(12).toLong)))
      } ++ Seq(
        (101L, Seq.empty[java.lang.Long]),                                // -> [null]
        (102L, Seq[java.lang.Long](7L)),                                  // n < w
        (103L, Seq.fill(4)(null.asInstanceOf[java.lang.Long])),           // all null
        (104L, Seq[java.lang.Long](5L, null, 3L, null, null, null, 9L, 2L))) // null windows
    for (w <- Seq(1, 4, 31)) {
      val df = rows.toDF("id", "h")
        .withColumn("native", WinnowSelect.expr(col("h"), w))
        .withColumn("hof", hofSelect(col("h"), w))
      val diff = df.filter(not(col("native") <=> col("hof")))
      assert(diff.count() == 0,
        s"w=$w mismatch: ${diff.select("id", "native", "hof").collect().mkString(", ")}")
    }
  }

  test("codegen and interpreted paths agree") {
    val df = Seq((1L, Seq(9L, 1L, 8L, 2L, 7L, 3L)), (2L, Seq(5L))).toDF("id", "h")
    spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    val interp = df.select(WinnowSelect.expr(col("h"), 3)).collect().map(_.getSeq[Long](0)).toSeq
    spark.conf.set("spark.sql.codegen.factoryMode", "FALLBACK")
    val gen = df.select(WinnowSelect.expr(col("h"), 3)).collect().map(_.getSeq[Long](0)).toSeq
    assert(interp == gen)
  }
}
