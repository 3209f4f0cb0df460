package graft.expr

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Per-document rolling char-trigram term frequencies as ONE native expression
  * — `array<struct<tri:string, tf:bigint>>`, trigrams sorted lexically.
  *
  * The composed form (`explode(transform(sequence(1, length(t)-2),
  * i -> substr(t, i, 3)))` + `groupBy(doc, tri).count()`) allocates one
  * 3-char string AND one exploded row PER CHARACTER of the corpus, then pays
  * a corpus-sized shuffle just to collapse within-document repeats. Here the
  * row's trigram histogram is built in one pass over the code points (a
  * per-row hash map — bounded by the document's distinct-trigram count) and
  * the explode emits |distinct trigrams| rows with their counts attached, so
  * the per-(doc,tri) aggregate disappears from the plan entirely. This is the
  * t18 scan term the r11 verdict flagged (42.6 s of the 100× suite).
  *
  * Exact parity with the composed form (CharTrigramCountsSpec pins it,
  * codegen and interpreted):
  *  - positions are CODE POINTS, like Spark's `length`/`substr` character
  *    semantics (a code-point index table is built once per row);
  *  - strings shorter than 3 characters yield an empty array (the
  *    `when(length >= 3, ...)` branch);
  *  - lowercasing stays OUTSIDE the expression (callers pass `lower(col)`),
  *    so the oracle's `lower()` composes identically. */
case class CharTrigramCounts(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("tri", StringType, nullable = false),
      StructField("tf", LongType, nullable = false))), containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "graft_char_trigram_counts"

  override def nullSafeEval(input: Any): Any =
    CharTrigramCounts.counts(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expr.CharTrigramCounts.counts($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object CharTrigramCounts {
  def expr(text: Column): Column =
    GraftSqlBridge.column(CharTrigramCounts(GraftSqlBridge.expression(text)))

  def counts(s: UTF8String): ArrayData = {
    val str = s.toString
    val len = str.length
    val n = str.codePointCount(0, len)
    if (n < 3) return new GenericArrayData(Array.empty[Any])
    // code-point start offsets: parity with substr's character positions
    val idx = new Array[Int](n + 1)
    var off = 0
    var cp = 0
    while (cp < n) { idx(cp) = off; off = str.offsetByCodePoints(off, 1); cp += 1 }
    idx(n) = len
    val m = new java.util.HashMap[String, Array[Long]]()
    cp = 0
    while (cp + 3 <= n) {
      val tri = str.substring(idx(cp), idx(cp + 3))
      val slot = m.get(tri)
      if (slot == null) m.put(tri, Array(1L)) else slot(0) += 1L
      cp += 1
    }
    val keys = new Array[String](m.size())
    m.keySet().toArray(keys)
    java.util.Arrays.sort(keys.asInstanceOf[Array[AnyRef]])
    val out = new Array[Any](keys.length)
    var i = 0
    while (i < keys.length) {
      out(i) = new GenericInternalRow(
        Array[Any](UTF8String.fromString(keys(i)), m.get(keys(i))(0)))
      i += 1
    }
    new GenericArrayData(out)
  }
}
