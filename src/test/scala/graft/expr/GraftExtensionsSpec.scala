package graft.expr

import graft.SparkSpec

/** All eight native expressions are registered for SQL via GraftExtensions
  * (TestSession sets `spark.sql.extensions=graft.expr.GraftExtensions`), with
  * SQL results matching the Column-API entry points. */
class GraftExtensionsSpec extends SparkSpec {

  test("winnow_select, vec_dot, cosine resolve and match the Column API") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val wsSql = spark.sql("SELECT graft_winnow_select(array(9L, 1L, 8L, 2L), 2)")
      .head().getSeq[Long](0)
    val wsApi = Seq(Seq(9L, 1L, 8L, 2L)).toDF("h")
      .select(WinnowSelect.expr(col("h"), 2)).head().getSeq[Long](0)
    assert(wsSql == wsApi && wsSql == Seq(1L, 2L))
    val r = spark.sql(
      "SELECT graft_vec_dot(array(1d,2d), array(3d,4d)), graft_cosine(array(1d,0d), array(1d,0d))")
      .head()
    assert(r.getDouble(0) == 11.0 && r.getDouble(1) == 1.0)
  }

  test("all five r7 graft_* functions resolve and evaluate in SQL") {
    // point-in-polygon: unit square
    assert(spark.sql(
      "SELECT graft_point_in_polygon(0.5, 0.5, array(0d,1d,1d,0d), array(0d,0d,1d,1d))")
      .head().getBoolean(0))
    // md5 60-bit hash: matches the Column API
    val viaSql = spark.sql("SELECT graft_md5_hash60('abc')").head().getLong(0)
    val viaApi = {
      import org.apache.spark.sql.functions._
      import spark.implicits._
      Seq("abc").toDF("s").select(Md5Hash60.expr(col("s"))).head().getLong(0)
    }
    assert(viaSql == viaApi)
    // normalized fingerprint: case/whitespace-insensitive equality
    val fps = spark.sql(
      "SELECT graft_norm_fingerprint('A  b'), graft_norm_fingerprint('a b')").head()
    assert(fps.get(0) == fps.get(1) && fps.get(0) != null)
    // simhash32: matches the Column API
    val shSql = spark.sql("SELECT graft_simhash32(array(1L, 2L, 3L))").head().getLong(0)
    val shApi = {
      import org.apache.spark.sql.functions._
      import spark.implicits._
      Seq(Seq(1L, 2L, 3L)).toDF("h").select(SimHash32.expr(col("h"))).head().getLong(0)
    }
    assert(shSql == shApi)
    // minhash signature: literal coefficient arrays, matches the Column API
    val mhSql = spark.sql(
      "SELECT graft_minhash_sig(array(7L, 11L), array(3L, 5L), array(1L, 2L))")
      .head().getSeq[Long](0)
    val mhApi = {
      import org.apache.spark.sql.functions._
      import spark.implicits._
      Seq(Seq(7L, 11L)).toDF("h")
        .select(MinHashSig.expr(col("h"), Seq(3L, 5L), Seq(1L, 2L)))
        .head().getSeq[Long](0)
    }
    assert(mhSql == mhApi)
  }

  test("minhash_sig rejects non-literal coefficients") {
    import spark.implicits._
    Seq(Seq(1L)).toDF("h").createOrReplaceTempView("mh_in")
    val e = intercept[Exception] {
      spark.sql("SELECT graft_minhash_sig(h, array(h[0]), array(1L)) FROM mh_in").collect()
    }
    assert(e.getMessage.contains("literal"))
  }
}
