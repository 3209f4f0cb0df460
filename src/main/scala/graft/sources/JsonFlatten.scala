package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, StructType}

/** Nested-metadata flattening (`/root/reference/scripts/3_qaqc_data/
  * homr_metadata.py:31-78`, `flatten_data`): the reference walks each station's
  * nested HOMR JSON and emits `parent_child_…` underscore-joined keys, with list
  * elements keyed by index; the ragged per-station dicts then union into tables.
  * (The HTTP pull itself is out of engine scope — the S10 parity cut; the engine
  * starts at landed JSON, `spark.read.json`.)
  *
  * Re-expressed Spark-first, schema-driven — all recursion happens over
  * `df.schema` at plan time, the data path is ONE projection:
  *  - [[flattenStructs]] expands every struct field (recursively) to a
  *    `parent_child` top-level column — the reference's dict rule verbatim;
  *  - arrays don't index-expand into unbounded `a_0_, a_1_, …` columns (the
  *    reference's list rule — anti-relational: the column set would depend on
  *    the widest row). [[explodeArray]] is the relational re-expression: one
  *    array column at a time posexplodes to rows keyed `(row, <name>_idx)`,
  *    preserving exactly the index the reference writes into its keys. */
object JsonFlatten {

  /** All struct fields recursively expanded to `parent_child` columns; arrays
    * and scalars pass through at their (prefixed) position. */
  def flattenStructs(df: DataFrame, sep: String = "_"): DataFrame = {
    def expand(prefix: String, qual: Column, t: org.apache.spark.sql.types.DataType): Seq[Column] =
      t match {
        case s: StructType => s.fields.toSeq.flatMap { f =>
          expand(prefix + sep + f.name, qual.getField(f.name), f.dataType)
        }
        case _ => Seq(qual.as(prefix))
      }
    val cols = df.schema.fields.toSeq.flatMap { f =>
      f.dataType match {
        case s: StructType => s.fields.toSeq.flatMap { g =>
          expand(f.name + sep + g.name, col("`" + f.name + "`").getField(g.name),
            g.dataType)
        }
        case _ => Seq(col("`" + f.name + "`"))
      }
    }
    df.select(cols: _*)
  }

  /** One array column to rows: `(…, <name>_idx, <name>)` via posexplode_outer —
    * empty/null arrays keep their row with a null element, so no station
    * disappears for having no maintenance log (the reference's ragged-union
    * NaN-fill). Chain per array, then [[flattenStructs]] again if elements are
    * structs. */
  def explodeArray(df: DataFrame, arrayCol: String): DataFrame = {
    require(df.schema(arrayCol).dataType.isInstanceOf[ArrayType],
      s"$arrayCol is not an array column")
    val others = df.columns.filter(_ != arrayCol).map(c => col("`" + c + "`")).toSeq
    df.select(others :+ posexplode_outer(col("`" + arrayCol + "`")): _*)
      .withColumnRenamed("pos", arrayCol + "_idx")
      .withColumnRenamed("col", arrayCol)
  }
}
