package graft.expr

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Pins [[SimHash32]] to the HOF formulation it replaced, and codegen to
  * interpreted. */
class SimHash32Spec extends SparkSpec {
  import spark.implicits._

  private def hofSimhash(th: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    // the pre-r7 formulation (bit i of h as floor(h/2^i) mod 2)
    def bitAt(h: org.apache.spark.sql.Column, i: org.apache.spark.sql.Column) =
      pmod(floor(h.cast("double") / pow(lit(2.0), i)).cast("long"), lit(2L))
    val counts = aggregate(th, array_repeat(lit(0L), 32),
      (acc, h) => zip_with(acc, sequence(lit(0), lit(31)),
        (a, i) => a + when(bitAt(h, i) === 1, 1L).otherwise(-1L)))
    aggregate(zip_with(counts, sequence(lit(0), lit(31)),
      (cnt, i) => when(cnt > 0, pow(lit(2.0), i).cast("long")).otherwise(0L)),
      lit(0L), (acc, bit) => acc + bit)
  }

  test("bit-identical to the HOF formulation on hashed token arrays") {
    val rng = new scala.util.Random(29)
    val rows = (1 to 60).map { i =>
      (i.toLong, Seq.fill(rng.nextInt(40))(rng.nextLong().abs % (1L << 32)))
    } :+ (99L, Seq.empty[Long]) // empty array -> all votes -1 -> 0
    val df = rows.toDF("id", "th")
      .withColumn("native", SimHash32.expr(col("th")))
      .withColumn("hof", hofSimhash(col("th")))
    assert(df.filter(col("native") =!= col("hof")).count() == 0)
    assert(df.filter(col("id") === 99L).select("native").as[Long].head() == 0L)
  }

  test("codegen and interpreted paths agree") {
    val df = Seq((1L, Seq(1L, 3L, 7L, 255L)), (2L, Seq((1L << 32) - 1))).toDF("id", "th")
    spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    val interp = df.select(SimHash32.expr(col("th"))).as[Long].collect().toSeq
    spark.conf.set("spark.sql.codegen.factoryMode", "FALLBACK")
    val gen = df.select(SimHash32.expr(col("th"))).as[Long].collect().toSeq
    assert(interp == gen)
  }
}
