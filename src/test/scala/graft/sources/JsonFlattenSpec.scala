package graft.sources

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Schema-driven nested-metadata flattening (`homr_metadata.py` flatten_data). */
class JsonFlattenSpec extends SparkSpec {
  import spark.implicits._

  test("flattenStructs: recursive underscore-joined columns; scalars pass through") {
    val df = spark.read.json(Seq(
      """{"id": 1, "a": {"b": {"c": 5, "d": "x"}, "e": 2.5}, "plain": "p"}"""
    ).toDS())
    val flat = JsonFlatten.flattenStructs(df)
    assert(flat.columns.sorted.toSeq == Seq("a_b_c", "a_b_d", "a_e", "id", "plain"))
    val r = flat.select("a_b_c", "a_b_d", "a_e", "id", "plain").head()
    assert(r.getLong(0) == 5L && r.getString(1) == "x" && r.getDouble(2) == 2.5 &&
      r.getLong(3) == 1L && r.getString(4) == "p")
  }

  test("explodeArray: (row, idx) normal form; empty and null arrays keep the row") {
    val df = spark.read.json(Seq(
      """{"id": 1, "logs": [{"s": 10}, {"s": 20}]}""",
      """{"id": 2, "logs": []}""",
      """{"id": 3}"""
    ).toDS())
    val rows = JsonFlatten.flattenStructs(
      JsonFlatten.explodeArray(df, "logs"))
    val got = rows.select("id", "logs_idx", "logs_s")
      .as[(Long, Option[Int], Option[Long])].collect().sortBy(r => (r._1, r._2))
    assert(got.toSeq == Seq(
      (1L, Some(0), Some(10L)), (1L, Some(1), Some(20L)),
      (2L, None, None), (3L, None, None)))
  }

  test("explodeArray refuses non-array columns") {
    intercept[IllegalArgumentException] {
      JsonFlatten.explodeArray(Seq((1, "x")).toDF("id", "s"), "s")
    }
  }
}
