package graft.expr

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, LongType}

/** 32-bit SimHash from an array of 32-bit token hashes as a NATIVE Catalyst
  * expression: each hash votes +1/-1 on every bit position; positive sums set bits.
  *
  * Replaces a nested HOF chain that had to express "bit i of h" as
  * `floor(h / 2^i) mod 2` (dynamic shift amounts don't exist in the functions API) —
  * 32 pow+floor+pmod double round-trips per TOKEN. Here it's `(h >>> i) & 1` in a
  * tight loop inside whole-stage codegen. Bit-identical by construction (the double
  * arithmetic was exact for h < 2^32); SimHash32Spec pins equivalence against the
  * HOF form and codegen/interpreted parity, and the d3/d6 DuckDB oracles stay exact.
  *
  * Null elements vote like hash 0 did in the HOF form's zip_with (they never occur
  * from the hashing pipeline; guarded to keep the expression total). */
case class SimHash32(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "graft_simhash32"

  override def nullSafeEval(input: Any): Any =
    SimHash32.simhash(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expr.SimHash32.simhash($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object SimHash32 {

  /** The shared kernel: counts[i] += bit(h, i) ? 1 : -1; result bit i = counts[i] > 0. */
  def simhash(hashes: ArrayData): Long = {
    val counts = new Array[Int](32)
    val n = hashes.numElements()
    var k = 0
    while (k < n) {
      val h = if (hashes.isNullAt(k)) 0L else hashes.getLong(k)
      var i = 0
      while (i < 32) {
        counts(i) += (if (((h >>> i) & 1L) == 1L) 1 else -1)
        i += 1
      }
      k += 1
    }
    var v = 0L
    var i = 0
    while (i < 32) {
      if (counts(i) > 0) v |= (1L << i)
      i += 1
    }
    v
  }

  /** Column-API entry over an `array<long>` of 32-bit token hashes. */
  def expr(h32: Column): Column =
    GraftSqlBridge.column(SimHash32(GraftSqlBridge.expression(h32)))
}
