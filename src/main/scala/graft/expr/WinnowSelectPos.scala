package graft.expr

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType, StructField, StructType}

/** POSITIONAL winnowing selection: [[WinnowSelect]]'s sliding-window minima with
  * the token position where each selected minimum occurs, as
  * `array<struct<fp: long, pos: int>>` sorted by (pos, fp) and deduplicated.
  *
  * This is the piece duplicated-span REMOVAL needs (Lee et al. 2022 remove one
  * occurrence of each cross-document duplicated run): detection (d13) only needs
  * the fingerprint VALUES, removal needs to know WHERE in the token stream the
  * shared gram sits. Same O(n) monotonic deque as [[WinnowSelect]]; ties inside
  * a window resolve to the RIGHTMOST minimal position (the deque pops `>=`),
  * which is also robust winnowing's tie rule (SIGMOD 2003 §4). Null hash entries
  * never select (they cannot occur from `kgramHashes`); an empty or all-null
  * input yields an empty array — positions for a null minimum don't exist, the
  * one deliberate delta from WinnowSelect's null-candidate parity contract. */
case class WinnowSelectPos(child: Expression, w: Int) extends UnaryExpression {
  require(w >= 1, "window width must be >= 1")

  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("fp", LongType, nullable = false),
      StructField("pos", IntegerType, nullable = false))), containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "graft_winnow_select_pos"

  override def nullSafeEval(input: Any): Any =
    WinnowSelectPos.select(input.asInstanceOf[ArrayData], w)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expr.WinnowSelectPos.select($c, $w)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object WinnowSelectPos {

  def select(h: ArrayData, w: Int): ArrayData = {
    val n = h.numElements()
    if (n == 0) return new GenericArrayData(Array.empty[Any])
    // (pos << 20 never needed — keep (fp, pos) pairs; selections are ~2n/(w+1))
    val selFp = new Array[Long](math.max(1, n))
    val selPos = new Array[Int](math.max(1, n))
    var out = 0
    if (n <= w) {
      var min = Long.MaxValue
      var minPos = -1
      var i = 0
      while (i < n) {
        if (!h.isNullAt(i)) {
          val v = h.getLong(i)
          if (minPos < 0 || v <= min) { min = v; minPos = i } // <=: rightmost tie
        }
        i += 1
      }
      if (minPos >= 0) { selFp(0) = min; selPos(0) = minPos; out = 1 }
    } else {
      val dq = new Array[Int](n)
      var head = 0
      var tail = 0
      var j = 0
      while (j < n) {
        if (!h.isNullAt(j)) {
          val v = h.getLong(j)
          while (tail > head && h.getLong(dq(tail - 1)) >= v) tail -= 1
          dq(tail) = j
          tail += 1
        }
        if (j >= w - 1) {
          val start = j - w + 1
          while (tail > head && dq(head) < start) head += 1
          if (tail > head) {
            val p = dq(head)
            // dedupe consecutive windows selecting the same position
            if (out == 0 || selPos(out - 1) != p) {
              selFp(out) = h.getLong(p); selPos(out) = p; out += 1
            }
          }
        }
        j += 1
      }
    }
    val res = new Array[Any](out)
    var i = 0
    while (i < out) {
      res(i) = new GenericInternalRow(Array[Any](selFp(i), selPos(i)))
      i += 1
    }
    new GenericArrayData(res)
  }

  /** Column-API entry over an `array<long>` of rolling k-gram hashes. */
  def expr(h: Column, w: Int): Column =
    GraftSqlBridge.column(WinnowSelectPos(GraftSqlBridge.expression(h), w))
}
