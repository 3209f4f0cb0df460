package graft.expr

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, LongType, StructField, StructType}

/** 64-bit perceptual difference-hash (dHash) as a NATIVE Catalyst expression
  * (r13 — the [[MinHashSig]]/CharTrigramCounts playbook applied to the image
  * family): bit j = y·hashW + x is set when gray(y,x) > gray(y,x+1) over a
  * row-major (hashW+1)×hashH integer raster, returned as `struct(hi, lo)` of
  * two longs (the two-halves convention that keeps every downstream sum
  * inside checked BIGINT in any engine — see MultimodalOps.dHash docs).
  *
  * The HOF formulation (`aggregate(sequence(0,31), ...)` twice) interprets
  * ~64 lambda bodies of element_at/when/shift expression trees per ROW — the
  * measured per-row floor of mm4r/mm5/pipe6 at 100× (≈186 µs/row·thread,
  * SCALE.md r13). Here the whole hash is one 64-step primitive loop, fully
  * codegen'd via a static call.
  *
  * Bit-identical to the HOF on well-formed rasters (MultimodalSpec pins
  * native == HOF and codegen == interpreted), and strictly MORE total: the
  * HOF's `element_at` throws on an out-of-range index (Spark 4 strict
  * indexing), while here an out-of-range or null cell simply leaves the bit
  * unset — a short raster hashes instead of failing the task. */
case class DHash64(child: Expression, hashW: Int) extends UnaryExpression {
  require(64 % hashW == 0, "hashW must divide 64")

  override def dataType: DataType = StructType(Seq(
    StructField("hi", LongType, nullable = false),
    StructField("lo", LongType, nullable = false)))
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "graft_dhash64"

  override def nullSafeEval(input: Any): Any =
    DHash64.hash(input.asInstanceOf[ArrayData], hashW)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expr.DHash64.hash($c, $hashW)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object DHash64 {

  /** One 64-step loop over the raster; out-of-range / null cells give an
    * unset bit (the HOF's element_at→null→otherwise(0) semantics). */
  def hash(gray: ArrayData, hashW: Int): InternalRow = {
    val n = gray.numElements()
    var hi = 0L
    var lo = 0L
    var j = 0
    while (j < 64) {
      val base = (j / hashW) * (hashW + 1) + (j % hashW)
      if (base + 1 < n && !gray.isNullAt(base) && !gray.isNullAt(base + 1) &&
          gray.getInt(base) > gray.getInt(base + 1)) {
        if (j < 32) lo |= 1L << j else hi |= 1L << (j - 32)
      }
      j += 1
    }
    new GenericInternalRow(Array[Any](hi, lo))
  }

  /** Column-API entry over a row-major `array<int>` luma raster. */
  def expr(gray: Column, hashW: Int): Column =
    GraftSqlBridge.column(DHash64(GraftSqlBridge.expression(gray), hashW))
}
