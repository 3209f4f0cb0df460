package graft.expr

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** MinHash signature as a NATIVE Catalyst expression: sig_i = min over the 32-bit
  * shingle hashes h of `(a_i * h + b_i) mod p` (p = 2^61 − 1), for all k hash
  * functions in ONE pass over the input array.
  *
  * The HOF formulation (`transform(sequence(0, k-1), i -> array_min(transform(h32,
  * h -> pmod(...))))`) materializes k intermediate arrays per ROW — k × |shingles|
  * boxed longs of garbage on the hottest path of the dedup family (the sig-table
  * build, the measured growth term in SCALE.md's 10× table). Here the k running
  * minima live in one `long[k]` and the generated code is two nested loops.
  *
  * Bit-identical: coefficients are 31-bit positives and h < 2^32, so `a*h + b`
  * stays within the positive 63-bit range the HOF's `pmod` saw — plain `%` agrees
  * (MinHashSigSpec pins equivalence and codegen/interpreted parity; the d2/d7
  * oracles, which inline the same formula in SQL, stay bit-exact). An EMPTY hash
  * array yields k null elements, exactly like `array_min` of an empty array. */
case class MinHashSig(child: Expression, as: Array[Long], bs: Array[Long])
  extends UnaryExpression {
  require(as.length == bs.length && as.nonEmpty, "need k >= 1 coefficient pairs")

  override def dataType: DataType = ArrayType(LongType, containsNull = true)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "graft_minhash_sig"

  override def nullSafeEval(input: Any): Any =
    MinHashSig.signature(input.asInstanceOf[ArrayData], as, bs)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val aRef = ctx.addReferenceObj("mhAs", as, "long[]")
    val bRef = ctx.addReferenceObj("mhBs", bs, "long[]")
    defineCodeGen(ctx, ev,
      c => s"graft.expr.MinHashSig.signature($c, $aRef, $bRef)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object MinHashSig {

  val Prime: Long = (1L << 61) - 1

  /** One pass over the hashes, k running minima; null out on an empty input
    * (matching `array_min(empty)`). Null elements are skipped like `transform`+
    * `array_min` skip... they cannot occur from the hashing pipeline, but a null
    * element would have produced a null min in the HOF form, so mirror that. */
  def signature(h32: ArrayData, as: Array[Long], bs: Array[Long]): ArrayData = {
    val k = as.length
    val n = h32.numElements()
    val out = new Array[Any](k)
    if (n == 0) return new GenericArrayData(out) // k nulls
    var hasNull = false
    val mins = new Array[Long](k)
    java.util.Arrays.fill(mins, Long.MaxValue)
    var j = 0
    while (j < n) {
      if (h32.isNullAt(j)) hasNull = true
      else {
        val h = h32.getLong(j)
        var i = 0
        while (i < k) {
          val v = (as(i) * h + bs(i)) % Prime
          if (v < mins(i)) mins(i) = v
          i += 1
        }
      }
      j += 1
    }
    // HOF parity: a null element made pmod -> null, and array_min propagates null
    // only when ALL elements are null; with any non-null element present the min of
    // the non-null values wins. An all-null input therefore yields k nulls.
    if (hasNull && n > 0 && (0 until n).forall(h32.isNullAt)) return new GenericArrayData(out)
    var i = 0
    while (i < k) { out(i) = mins(i); i += 1 }
    new GenericArrayData(out)
  }

  /** Column-API entry over an `array<long>` of 32-bit shingle hashes. */
  def expr(h32: Column, as: Seq[Long], bs: Seq[Long]): Column =
    GraftSqlBridge.column(MinHashSig(GraftSqlBridge.expression(h32),
      as.toArray, bs.toArray))
}
