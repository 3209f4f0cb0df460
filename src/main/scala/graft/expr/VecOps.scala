package graft.expr

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Dense-vector kernels as NATIVE Catalyst expressions.
  *
  * The HOF formulations (`aggregate(zip_with(a, b, (x,y) -> x*y), 0.0, +)` and the
  * cosine built from three of them) are evaluated INTERPRETED — higher-order
  * functions sit outside whole-stage codegen, and each evaluation allocates the
  * zipped/transformed intermediate array. On pair-quadratic paths (d12's in-cell
  * SemDeDup verify: ~1.9 M cosines at sf0.1) that interpretation dominated the
  * query. These run as one codegen'd call, no intermediates.
  *
  * Bit-identical by construction (VecOpsSpec pins equivalence and codegen/
  * interpreted parity; every e-family/d5/d12 oracle, which inlines the same
  * ordered folds in SQL, stays bit-exact):
  *  - accumulation order is the HOF fold's left-to-right order, one accumulator
  *    per sum — plain IEEE multiply/add, no FMA, no reassociation;
  *  - cosine guard is exactly `when(sqrt(aa)*sqrt(bb) === 0.0, 0.0)
  *    .otherwise(dot/denom)` — NaN denominators fall through to NaN;
  *  - a null element or length mismatch yields NULL, matching zip_with's
  *    null-padding → null product → null sum propagation. */
object VecOps {

  /** Ordered dot product; boxed so null can signal the HOF null semantics.
    *
    * Float-precision parity: Catalyst's `Multiply` of two FLOAT elements rounds
    * the product to FLOAT before `aggregate`'s double accumulator widens it
    * (`x * y` in the zip_with lambda is float×float → float). A float×double mix
    * widens the float first, so only the both-float case rounds. Mirrored here —
    * this is observable (e6 assigns cells differently without it). */
  def dotBoxed(a: ArrayData, b: ArrayData, aF: Boolean, bF: Boolean): java.lang.Double = {
    val n = a.numElements()
    if (n != b.numElements()) return null
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      acc += (if (aF && bF) (a.getFloat(i) * b.getFloat(i)).toDouble
              else elem(a, i, aF) * elem(b, i, bF))
      i += 1
    }
    acc
  }

  /** Fused cosine: one pass, three ordered accumulators (ab, aa, bb); each
    * accumulator follows its own array's float-product rule (aa rounds to float
    * iff `a` is a float array, etc. — exactly the composed l2Norm/dot chain). */
  def cosineBoxed(a: ArrayData, b: ArrayData, aF: Boolean, bF: Boolean): java.lang.Double = {
    val n = a.numElements()
    if (n != b.numElements()) return null
    var ab = 0.0; var aa = 0.0; var bb = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      if (aF && bF) {
        val xf = a.getFloat(i); val yf = b.getFloat(i)
        ab += (xf * yf).toDouble; aa += (xf * xf).toDouble; bb += (yf * yf).toDouble
      } else {
        val x = elem(a, i, aF); val y = elem(b, i, bF)
        ab += x * y
        aa += (if (aF) { val xf = a.getFloat(i); (xf * xf).toDouble } else x * x)
        bb += (if (bF) { val yf = b.getFloat(i); (yf * yf).toDouble } else y * y)
      }
      i += 1
    }
    val d = math.sqrt(aa) * math.sqrt(bb)
    if (d == 0.0) 0.0 else ab / d
  }

  @inline private def elem(v: ArrayData, i: Int, isFloat: Boolean): Double =
    if (isFloat) v.getFloat(i).toDouble else v.getDouble(i)
}

sealed trait VecBinary extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  protected def helper: String

  private def isFloatArr(e: Expression): Boolean = e.dataType match {
    case org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.FloatType, _) => true
    case org.apache.spark.sql.types.ArrayType(DoubleType, _) => false
    case t => throw new IllegalArgumentException(
      s"$prettyName needs array<float|double> inputs, got $t")
  }
  protected def leftF: Boolean = isFloatArr(left)
  protected def rightF: Boolean = isFloatArr(right)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val r = ctx.freshName("vecr")
      s"""java.lang.Double $r = graft.expr.VecOps.$helper($a, $b, $leftF, $rightF);
         |if ($r == null) { ${ev.isNull} = true; } else { ${ev.value} = $r.doubleValue(); }
         |""".stripMargin
    })
}

/** `dot(a, b)` — see [[VecOps]]. */
case class VecDot(left: Expression, right: Expression) extends VecBinary {
  override def prettyName: String = "graft_vec_dot"
  override protected def helper: String = "dotBoxed"
  override def nullSafeEval(a: Any, b: Any): Any =
    VecOps.dotBoxed(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData], leftF, rightF)
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** `cosine(a, b)` with the zero-denominator guard — see [[VecOps]]. */
case class CosineSim(left: Expression, right: Expression) extends VecBinary {
  override def prettyName: String = "graft_cosine"
  override protected def helper: String = "cosineBoxed"
  override def nullSafeEval(a: Any, b: Any): Any =
    VecOps.cosineBoxed(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData], leftF, rightF)
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

object VecDot {
  def expr(a: Column, b: Column): Column =
    GraftSqlBridge.column(VecDot(GraftSqlBridge.expression(a), GraftSqlBridge.expression(b)))
}

object CosineSim {
  def expr(a: Column, b: Column): Column =
    GraftSqlBridge.column(CosineSim(GraftSqlBridge.expression(a), GraftSqlBridge.expression(b)))
}
