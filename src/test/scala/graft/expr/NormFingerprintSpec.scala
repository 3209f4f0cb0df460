package graft.expr

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.text.TextOps

/** Pins [[NormFingerprint]] to the composed md5/concat_ws/tokens/lower form every
  * DuckDB oracle inlines, and codegen to interpreted. */
class NormFingerprintSpec extends SparkSpec {
  import spark.implicits._

  private val samples = Seq(
    "", " ", "a", "A  B\tC", "  leading and   trailing  ", "tabs\tand\nnewlines\r\nmix",
    "ÜNÏCÖDÉ Case FOLD", "İstanbul DOTTED", "ẞharp ß", "漢字 と かな", "emoji 🙂 TEXT",
    "x" * 300 + "\t" + "Y" * 300, " vertical \f feed")

  test("bit-identical to md5(concat_ws(' ', tokens(lower(text))))") {
    val df = samples.toDF("s")
      .withColumn("native", NormFingerprint.expr(col("s")))
      .withColumn("composed", md5(concat_ws(" ", TextOps.tokens(lower(col("s"))))))
    assert(df.filter(col("native") =!= col("composed")).count() == 0)
  }

  test("SQL registration: graft_norm_fingerprint resolves via GraftExtensions") {
    val got = spark.sql("SELECT graft_norm_fingerprint('  A  b\tC ') AS f")
      .collect().head.getString(0)
    val want = Seq("a b c").toDF("s").select(md5(col("s"))).collect().head.getString(0)
    assert(got == want)
  }

  test("codegen and interpreted paths agree; nulls propagate") {
    val df = (samples.map(Option(_)) :+ None).toDF("s")
    spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    val interp = df.select(NormFingerprint.expr(col("s"))).collect().map(_.get(0)).toSeq
    spark.conf.set("spark.sql.codegen.factoryMode", "FALLBACK")
    val gen = df.select(NormFingerprint.expr(col("s"))).collect().map(_.get(0)).toSeq
    assert(interp == gen)
    assert(gen.last == null)
  }
}
