package graft.expr

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Pins [[KgramMd5]] to the slice/concat_ws/md5 HOF chain it replaced, and
  * codegen to interpreted. */
class KgramMd5Spec extends SparkSpec {
  import spark.implicits._

  private def hofGrams(toks: org.apache.spark.sql.Column, k: Int): org.apache.spark.sql.Column = {
    // the pre-r8 kgramHashes formulation (over an already-tokenized column)
    val grams = when(size(toks) < k, array(concat_ws(" ", toks)))
      .otherwise(transform(sequence(lit(1), size(toks) - k + 1),
        i => concat_ws(" ", slice(toks, i, lit(k)))))
    transform(grams, g => Md5Hash60.expr(g))
  }

  test("bit-identical to the HOF formulation across sizes and null tokens") {
    val rng = new scala.util.Random(29)
    val words = "alpha beta gamma delta epsilon zeta".split(" ")
    val rows: Seq[(Long, Seq[String])] =
      (1 to 60).map { i =>
        (i.toLong, Seq.fill(rng.nextInt(30))(words(rng.nextInt(words.length))))
      } ++ Seq(
        (101L, Seq.empty[String]),                 // empty -> md5("") single gram
        (102L, Seq("solo")),                       // n < k
        (103L, Seq("a", null, "b", "c", null, "d", "e"))) // concat_ws null-skip
    for (k <- Seq(1, 3, 5, 20)) {
      val df = rows.toDF("id", "toks")
        .withColumn("native", KgramMd5.expr(col("toks"), k))
        .withColumn("hof", hofGrams(col("toks"), k))
      val diff = df.filter(not(col("native") <=> col("hof")))
      assert(diff.count() == 0,
        s"k=$k mismatch: ${diff.select("id").collect().mkString(", ")}")
    }
  }

  test("codegen and interpreted paths agree") {
    val df = Seq((1L, Seq("x", "y", "z", "w"))).toDF("id", "toks")
    spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    val i = df.select(KgramMd5.expr(col("toks"), 2)).collect().head.getSeq[Long](0)
    spark.conf.set("spark.sql.codegen.factoryMode", "FALLBACK")
    val g = df.select(KgramMd5.expr(col("toks"), 2)).collect().head.getSeq[Long](0)
    assert(i == g)
  }
}
