package graft.expr

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Winnowing fingerprint selection (sorted distinct sliding-window minima) as a
  * NATIVE Catalyst expression.
  *
  * The HOF formulation (`transform(sequence(1, n-w+1), i -> array_min(slice(h, i,
  * w)))` then `array_sort(array_distinct(...))`) allocates a w-element array per
  * position — O(n·w) boxed copies per document, evaluated INTERPRETED because
  * higher-order functions don't participate in whole-stage codegen. At the d13
  * defaults (k=20, w=31) that was ~31 array copies per token on every document in
  * the corpus — measured 6.8 s (50 s cold) for d13 at sf0.1. Here the window
  * minima come from a monotonic deque in O(n) with one long[] of scratch, then
  * one sort + linear dedupe; the whole selection is a single codegen'd call.
  *
  * Bit-identical to the composed form (WinnowSelectSpec pins equivalence and
  * codegen/interpreted parity; the t3/d13 oracles, which inline the slice form in
  * SQL, stay bit-exact):
  *  - n == 0      → [null]                    (array_min of an empty array)
  *  - n <= w      → [min of all non-null]     (single whole-array window)
  *  - n >  w      → sorted distinct minima of the n-w+1 width-w windows
  *  - an all-null window yields a null candidate; array_distinct keeps one null
  *    and array_sort places it LAST — mirrored here (cannot occur from
  *    kgramHashes, whose md5 output is never null, but parity is parity). */
case class WinnowSelect(child: Expression, w: Int) extends UnaryExpression {
  require(w >= 1, "window width must be >= 1")

  override def dataType: DataType = ArrayType(LongType, containsNull = true)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "graft_winnow_select"

  override def nullSafeEval(input: Any): Any =
    WinnowSelect.select(input.asInstanceOf[ArrayData], w)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expr.WinnowSelect.select($c, $w)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object WinnowSelect {

  /** Sorted distinct sliding-window minima; see the case-class scaladoc for the
    * exact HOF-parity contract. */
  def select(h: ArrayData, w: Int): ArrayData = {
    val n = h.numElements()
    if (n == 0) return new GenericArrayData(Array[Any](null))
    if (n <= w) {
      var min = Long.MaxValue
      var found = false
      var i = 0
      while (i < n) {
        if (!h.isNullAt(i)) {
          val v = h.getLong(i)
          if (!found || v < min) { min = v; found = true }
        }
        i += 1
      }
      return new GenericArrayData(
        if (found) Array[Any](min) else Array[Any](null))
    }
    val m = n - w + 1
    val mins = new Array[Long](m)
    var hasNullMin = false
    // monotonic deque of indices with strictly increasing values; null elements
    // never enter, so an empty deque over a window means the window was all-null
    val dq = new Array[Int](n)
    var head = 0
    var tail = 0 // exclusive
    var j = 0
    var out = 0
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
        if (tail > head) { mins(out) = h.getLong(dq(head)); out += 1 }
        else hasNullMin = true
      }
      j += 1
    }
    java.util.Arrays.sort(mins, 0, out)
    var distinct = 0
    var i = 0
    while (i < out) {
      if (distinct == 0 || mins(i) != mins(distinct - 1)) {
        mins(distinct) = mins(i); distinct += 1
      }
      i += 1
    }
    val res = new Array[Any](distinct + (if (hasNullMin) 1 else 0))
    i = 0
    while (i < distinct) { res(i) = mins(i); i += 1 }
    new GenericArrayData(res) // trailing slot (if any) stays null: sort-null-last
  }

  /** Column-API entry over an `array<long>` of rolling k-gram hashes. */
  def expr(h: Column, w: Int): Column =
    GraftSqlBridge.column(WinnowSelect(GraftSqlBridge.expression(h), w))
}
