package graft.expr

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Pins [[CharTrigramCounts]] to the explode/substr/groupBy chain it replaced
  * (t18's pre-r12 formulation), and codegen to interpreted. */
class CharTrigramCountsSpec extends SparkSpec {
  import spark.implicits._

  test("histogram equals the explode+substr+groupBy formulation") {
    val rng = new scala.util.Random(31)
    val alphabet = "abcdefg hij"
    val rows: Seq[(Long, String)] =
      (1 to 50).map(i => (i.toLong,
        Seq.fill(rng.nextInt(60))(alphabet(rng.nextInt(alphabet.length))).mkString)) ++
        Seq((101L, ""), (102L, "ab"), (103L, "abc"), (104L, "aaaaaa"),
          (105L, "Mixed CASE Text"), (106L, "naïve café naïve"))
    val df = rows.toDF("id", "text").persist()
    val native = df.select(col("id"),
        explode(CharTrigramCounts.expr(lower(col("text")))).as("_tc"))
      .select(col("id"), col("_tc.tri").as("tri"), col("_tc.tf").as("tf"))
    val t = lower(col("text"))
    val composed = df.select(col("id"),
        explode(when(length(t) >= 3,
          transform(sequence(lit(1), length(t) - 2), i => t.substr(i, lit(3))))
          .otherwise(array().cast("array<string>"))).as("tri"))
      .groupBy(col("id"), col("tri")).agg(count(lit(1)).as("tf"))
    assert(native.exceptAll(composed).count() == 0)
    assert(composed.exceptAll(native).count() == 0)
    // short strings produce nothing at all
    assert(native.filter(col("id").isin(101L, 102L)).count() == 0)
    df.unpersist()
  }

  test("codegen and interpreted paths agree; output sorted by trigram") {
    val df = Seq((1L, "banana band")).toDF("id", "text")
    def run(): Seq[(String, Long)] = df
      .select(CharTrigramCounts.expr(col("text")).as("tc")).collect().head
      .getSeq[org.apache.spark.sql.Row](0).map(r => (r.getString(0), r.getLong(1)))
    spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    val interp = run()
    spark.conf.set("spark.sql.codegen.factoryMode", "FALLBACK")
    val gen = run()
    assert(interp == gen)
    assert(interp == interp.sortBy(_._1))
    assert(interp.toMap == Map("ban" -> 2L, "ana" -> 2L, "nan" -> 1L,
      "na " -> 1L, "a b" -> 1L, " ba" -> 1L, "and" -> 1L))
  }
}
