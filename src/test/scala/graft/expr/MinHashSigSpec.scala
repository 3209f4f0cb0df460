package graft.expr

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.dedup.DedupOps

/** Pins [[MinHashSig]] to the k-nested-transform HOF it replaced, and codegen to
  * interpreted. */
class MinHashSigSpec extends SparkSpec {
  import spark.implicits._

  private val (as, bs) = DedupOps.minhashCoeffs(32)

  private def hofSig(h32: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    // the pre-r7 formulation
    val aArr = array(as.map(lit): _*)
    val bArr = array(bs.map(lit): _*)
    transform(sequence(lit(0), lit(31)), i =>
      array_min(transform(h32,
        h => pmod(element_at(aArr, i + 1) * h + element_at(bArr, i + 1),
          lit(DedupOps.MinhashPrime)))))
  }

  test("bit-identical to the HOF formulation, incl. empty arrays") {
    val rng = new scala.util.Random(31)
    val rows = (1 to 60).map { i =>
      (i.toLong, Seq.fill(1 + rng.nextInt(60))(rng.nextLong().abs % (1L << 32)))
    } :+ (99L, Seq.empty[Long])
    val df = rows.toDF("id", "h32")
      .withColumn("native", MinHashSig.expr(col("h32"), as, bs))
      .withColumn("hof", hofSig(col("h32")))
    assert(df.filter(not(col("native") <=> col("hof"))).count() == 0)
    // empty input -> 32 nulls (array_min-of-empty parity)
    val empty = df.filter(col("id") === 99L)
      .select(col("native")).collect().head.getSeq[Any](0)
    assert(empty.size == 32 && empty.forall(_ == null))
  }

  test("codegen and interpreted paths agree") {
    val df = Seq((1L, Seq(5L, 17L, 4096L)), (2L, Seq((1L << 32) - 1))).toDF("id", "h32")
    spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    val interp = df.select(MinHashSig.expr(col("h32"), as, bs))
      .collect().map(_.getSeq[Long](0)).toSeq
    spark.conf.set("spark.sql.codegen.factoryMode", "FALLBACK")
    val gen = df.select(MinHashSig.expr(col("h32"), as, bs))
      .collect().map(_.getSeq[Long](0)).toSeq
    assert(interp == gen)
  }
}
