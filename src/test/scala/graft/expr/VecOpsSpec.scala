package graft.expr

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Pins [[VecDot]]/[[CosineSim]] to the aggregate/zip_with HOF folds they
  * replaced, and codegen to interpreted. */
class VecOpsSpec extends SparkSpec {
  import spark.implicits._

  private def hofDot(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, v) => acc + v)

  private def hofCosine(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) = {
    def l2(v: org.apache.spark.sql.Column) =
      sqrt(aggregate(transform(v, x => x * x), lit(0.0), (acc, v) => acc + v))
    val d = l2(a) * l2(b)
    when(d === 0.0, 0.0).otherwise(hofDot(a, b) / d)
  }

  test("bit-identical to the HOF folds: random, zero, empty, mismatched, null") {
    val rng = new scala.util.Random(23)
    val rows: Seq[(Long, Seq[java.lang.Double], Seq[java.lang.Double])] =
      (1 to 60).map { i =>
        val n = 1 + rng.nextInt(64)
        (i.toLong,
          Seq.fill(n)(java.lang.Double.valueOf(rng.nextGaussian())),
          Seq.fill(n)(java.lang.Double.valueOf(rng.nextGaussian())))
      } ++ Seq(
        (101L, Seq[java.lang.Double](0.0, 0.0), Seq[java.lang.Double](1.0, 2.0)), // zero norm
        (102L, Seq.empty[java.lang.Double], Seq.empty[java.lang.Double]),         // empty
        (103L, Seq[java.lang.Double](1.0, 2.0), Seq[java.lang.Double](3.0)),      // mismatch
        (104L, Seq[java.lang.Double](1.0, null), Seq[java.lang.Double](2.0, 3.0))) // null elem
    val df = rows.toDF("id", "a", "b")
      .withColumn("nd", VecDot.expr(col("a"), col("b")))
      .withColumn("hd", hofDot(col("a"), col("b")))
      .withColumn("nc", CosineSim.expr(col("a"), col("b")))
      .withColumn("hc", hofCosine(col("a"), col("b")))
    assert(df.filter(not(col("nd") <=> col("hd"))).count() == 0, "dot parity")
    assert(df.filter(not(col("nc") <=> col("hc"))).count() == 0, "cosine parity")
    // empty arrays: fold over nothing = seed -> dot 0.0, cosine guard -> 0.0
    val e = df.filter(col("id") === 102L).select("nd", "nc").collect().head
    assert(e.getDouble(0) == 0.0 && e.getDouble(1) == 0.0)
    // mismatch / null element -> null (zip_with null-padding parity)
    assert(df.filter(col("id").isin(103L, 104L))
      .filter(col("nd").isNotNull || col("nc").isNotNull).count() == 0)
  }

  test("float arrays: float-product rounding matches the HOF fold (the e6 case)") {
    // Catalyst multiplies FLOAT elements in float precision before the double
    // accumulator widens; a double-math kernel assigns e6's k-means cells
    // differently. Pin parity on raw float arrays and on the float x double mix.
    val rng = new scala.util.Random(41)
    val rows = (1 to 40).map { i =>
      val n = 1 + rng.nextInt(64)
      (i.toLong, Seq.fill(n)(rng.nextGaussian().toFloat), Seq.fill(n)(rng.nextGaussian().toFloat))
    }
    val df = rows.toDF("id", "a", "b")
      .withColumn("bd", col("b").cast("array<double>"))
    val checks = df
      .withColumn("nd", VecDot.expr(col("a"), col("b")))
      .withColumn("hd", hofDot(col("a"), col("b")))
      .withColumn("nc", CosineSim.expr(col("a"), col("b")))
      .withColumn("hc", hofCosine(col("a"), col("b")))
      .withColumn("nm", CosineSim.expr(col("a"), col("bd")))
      .withColumn("hm", hofCosine(col("a"), col("bd")))
    assert(checks.filter(not(col("nd") <=> col("hd"))).count() == 0, "float dot parity")
    assert(checks.filter(not(col("nc") <=> col("hc"))).count() == 0, "float cosine parity")
    assert(checks.filter(not(col("nm") <=> col("hm"))).count() == 0, "mixed cosine parity")
  }

  test("codegen and interpreted paths agree") {
    val df = Seq((1L, Seq(1.0, -2.5, 3.25), Seq(0.5, 4.0, -1.0))).toDF("id", "a", "b")
    def vals() = df.select(VecDot.expr(col("a"), col("b")),
      CosineSim.expr(col("a"), col("b"))).collect().head
    spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    val i = vals()
    spark.conf.set("spark.sql.codegen.factoryMode", "FALLBACK")
    val g = vals()
    assert(i.getDouble(0) == g.getDouble(0) && i.getDouble(1) == g.getDouble(1))
  }

  test("SqDot: bit-identical to the HOF expansion; null/mismatch/codegen parity (r15)") {
    val rng = new scala.util.Random(31)
    val rows = (1 to 40).map { i =>
      (i.toLong, Seq.fill(16)(rng.nextGaussian()), Seq.fill(16)(rng.nextGaussian()))
    } ++ Seq((100L, Seq.fill(16)(2.5), Seq.fill(16)(rng.nextGaussian()))) // mx == mn
    val df = rows.toDF("id", "cv", "qv")
      .withColumn("sq", graft.ann.AnnOps.quantizeInt8(col("cv")))
    def hofSq(qv: org.apache.spark.sql.Column, sq: org.apache.spark.sql.Column) = {
      val s1 = aggregate(zip_with(qv, sq.getField("codes"),
        (qi, c) => qi * (c + lit(128)).cast("double")), lit(0.0), (a, v) => a + v)
      val s2 = aggregate(qv, lit(0.0), (a, v) => a + v)
      (sq.getField("mx") - sq.getField("mn")) / lit(255.0) * s1 + sq.getField("mn") * s2
    }
    val cmp = df.withColumn("n", SqDot.expr(col("qv"), col("sq")))
      .withColumn("h", hofSq(col("qv"), col("sq")))
    assert(cmp.filter(not(col("n") <=> col("h"))).count() == 0, "sqdot parity")
    // length mismatch -> null
    val mm = df.limit(1).withColumn("q3", array(lit(1.0), lit(2.0)))
      .select(SqDot.expr(col("q3"), col("sq"))).collect().head
    assert(mm.isNullAt(0))
    // codegen == interpreted
    def vals() = df.orderBy("id").limit(3)
      .select(SqDot.expr(col("qv"), col("sq"))).collect().map(_.getDouble(0)).toSeq
    spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    val i = vals()
    spark.conf.set("spark.sql.codegen.factoryMode", "FALLBACK")
    assert(i == vals())
  }
}
