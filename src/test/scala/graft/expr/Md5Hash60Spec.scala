package graft.expr

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Pins [[Md5Hash60]] to the composed form every DuckDB oracle inlines, and its
  * codegen path to the interpreted one. */
class Md5Hash60Spec extends SparkSpec {
  import spark.implicits._

  private val samples = Seq(
    "", "a", "spark sql batch", "the quick brown fox", "ünïcödé ツ 漢字",
    "x" * 500, "multi\nline\ttext", "0", " leading and trailing ") ++
    (1 to 50).map(i => s"doc $i shingle ${i * 7919}")

  test("bit-identical to conv(substring(md5(s),1,15),16,10)") {
    val df = samples.toDF("s")
      .withColumn("native", Md5Hash60.expr(col("s")))
      .withColumn("composed", conv(substring(md5(col("s")), 1, 15), 16, 10).cast("long"))
    assert(df.filter(col("native") =!= col("composed")).count() == 0)
    // range contract: 60-bit non-negative
    assert(df.filter(col("native") < 0 || col("native") >= (1L << 60)).count() == 0)
  }

  test("SQL registration: graft_md5_hash60 resolves via GraftExtensions") {
    val got = spark.sql("SELECT graft_md5_hash60('spark sql batch') AS h")
      .collect().head.getLong(0)
    val want = samples.toDF("s").filter(col("s") === "spark sql batch")
      .select(conv(substring(md5(col("s")), 1, 15), 16, 10).cast("long"))
      .collect().head.getLong(0)
    assert(got == want)
  }

  test("codegen and interpreted paths agree; nulls propagate") {
    val df = (samples.map(Option(_)) :+ None).toDF("s")
    spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    val interp = df.select(Md5Hash60.expr(col("s"))).collect().map(_.get(0)).toSeq
    spark.conf.set("spark.sql.codegen.factoryMode", "FALLBACK")
    val gen = df.select(Md5Hash60.expr(col("s"))).collect().map(_.get(0)).toSeq
    assert(interp == gen)
    assert(gen.last == null) // null in -> null out (nullIntolerant)
  }
}
