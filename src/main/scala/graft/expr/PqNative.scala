package graft.expr

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Product-quantization encode (optionally fused with the IVF residual) as ONE
  * native codegen'd Catalyst expression — the production encode path for the
  * IVF-PQ index build (the reference's ANN analog; see SURVEY §2 LLM-ops).
  *
  * The HOF formulation (`transform(sequence(0, m-1), s -> aggregate(sequence(0,
  * k-1), ...))`, plus a `zip_with` residual subtraction in the IVF-residual
  * variant) evaluates INTERPRETED — higher-order functions sit outside
  * whole-stage codegen — and allocates a zipped residual array plus m*k fold
  * structs per corpus row. That interpreted layer was the measured encode floor
  * of the ANN family (SCALE.md: e11 10× exp 0.71 vs e8's 0.45 shape). Here the
  * whole encode is two nested loops over a flattened codebook `double[]` with a
  * reusable subvector buffer — no intermediates, runs inside codegen.
  *
  * Bit-identical to the HOF form by construction (PqNativeSpec pins parity and
  * codegen/interpreted equivalence; the e7/e8/e11 oracles, which inline the
  * same fixed-order folds in SQL, stay bit-exact):
  *  - distances accumulate left-to-right per subspace (`acc + x*x`, seed 0.0),
  *    plain IEEE double arithmetic, no FMA, no reassociation;
  *  - the argmin keeps strict `<` (ties -> LOWEST code) against a
  *    (Double.MaxValue, -1) seed, so an all-null/NaN subspace yields code -1
  *    and dist MaxValue exactly like the HOF's null-predicate fallthrough;
  *  - float vectors widen per element BEFORE subtraction (Catalyst's
  *    float-minus-double cast), matching `zip_with`/`element_at` semantics;
  *  - `sse` is the left-to-right sum of the chosen per-subspace distances.
  *
  * The residual variant replicates `zip_with(vec, centroids[cell], -)` null
  * semantics: an out-of-range index, null element, or invalid cell makes every
  * candidate distance null, so the subspace's code is -1 — identical to the
  * composed HOF expression under non-ANSI `element_at`.
  */
object PqOps {

  /** One corpus row: codes + sse. `cents` is the flattened nCells×dim centroid
    * grid (empty + residual=false for the plain encode); `cb` is the flattened
    * m×k×subDim codebook grid. */
  def encodeRow(vec: ArrayData, vecF: Boolean, cellNull: Boolean, cell: Int,
                cents: Array[Double], dim: Int,
                cb: Array[Double], m: Int, k: Int, subDim: Int,
                residual: Boolean): InternalRow = {
    val codes = new Array[Int](m)
    var sse = 0.0
    val nCent = if (dim > 0) cents.length / dim else 0
    val cellOk = !residual || (!cellNull && cell >= 0 && cell < nCent)
    val centBase = if (residual && cellOk) cell * dim else 0
    val vLen = if (vec == null) 0 else vec.numElements()
    val buf = new Array[Double](subDim)
    var s = 0
    while (s < m) {
      var ok = cellOk
      var j = 0
      while (ok && j < subDim) {
        val idx = s * subDim + j
        if (vec == null || idx >= vLen || vec.isNullAt(idx) ||
            (residual && idx >= dim)) ok = false
        else {
          val x = if (vecF) vec.getFloat(idx).toDouble else vec.getDouble(idx)
          buf(j) = if (residual) x - cents(centBase + idx) else x
        }
        j += 1
      }
      var bestD = Double.MaxValue
      var bestC = -1
      if (ok) {
        var ci = 0
        while (ci < k) {
          val base = (s * k + ci) * subDim
          var d = 0.0
          var t = 0
          while (t < subDim) { val x = buf(t) - cb(base + t); d += x * x; t += 1 }
          if (d < bestD) { bestD = d; bestC = ci }
          ci += 1
        }
      }
      codes(s) = bestC
      sse += bestD
      s += 1
    }
    new GenericInternalRow(Array[Any](new GenericArrayData(codes), sse))
  }

  /** IVF cell assignment for one row — the native twin of `AnnOps.ivfAssign`'s
    * HOF fold (spherical argmax, ties to the HIGHER cid via `>=`, seed = cell
    * 0's nanvl-guarded cosine). Cosine arithmetic mirrors
    * [[VecOps.cosineBoxed]] exactly, including the float-square rounding rule
    * when `vec` is a float array.
    *
    * Degenerate contracts, matching the HOF comparison semantics exactly:
    *  - null cosine (null vec / null element / length mismatch) is uniform
    *    across candidates, every `when` falls through -> cell 0 (the seed cid);
    *  - NaN cosine is uniform too, but Spark comparisons rank NaN LARGEST
    *    (`NaN >= x` and `NaN >= NaN` are both true), so every candidate
    *    replaces the seed and the all-NaN vector lands in cell nCent-1. */
  def assignRow(vec: ArrayData, vecF: Boolean,
                cents: Array[Double], dim: Int, nCent: Int): Int = {
    if (nCent <= 1) return 0
    val vLen = if (vec == null) 0 else vec.numElements()
    // cosine is null (length mismatch / null element / null vec) uniformly
    // across candidates -> every comparison falls through -> cell 0
    if (vec == null || vLen != dim) return 0
    var i = 0
    while (i < vLen) { if (vec.isNullAt(i)) return 0; i += 1 }
    var bestCos = cosineAgainst(vec, vecF, cents, 0, dim)
    if (bestCos.isNaN) bestCos = Double.NegativeInfinity
    var bestCid = 0
    var ci = 1
    while (ci < nCent) {
      val cos = cosineAgainst(vec, vecF, cents, ci * dim, dim)
      // Spark's `>=`: NaN outranks everything (and itself), unlike Java's
      if (cos >= bestCos || cos.isNaN) { bestCos = cos; bestCid = ci }
      ci += 1
    }
    bestCid
  }

  @inline private def cosineAgainst(vec: ArrayData, vecF: Boolean,
                                    cents: Array[Double], base: Int,
                                    dim: Int): Double = {
    var ab = 0.0; var aa = 0.0; var bb = 0.0
    var i = 0
    while (i < dim) {
      val x = if (vecF) vec.getFloat(i).toDouble else vec.getDouble(i)
      val y = cents(base + i)
      ab += x * y
      aa += (if (vecF) { val xf = vec.getFloat(i); (xf * xf).toDouble } else x * x)
      bb += y * y
      i += 1
    }
    val d = math.sqrt(aa) * math.sqrt(bb)
    if (d == 0.0) 0.0 else ab / d
  }

  private[expr] def isFloatArr(e: Expression, who: String): Boolean = e.dataType match {
    case ArrayType(FloatType, _) => true
    case ArrayType(DoubleType, _) => false
    case t => throw new IllegalArgumentException(
      s"$who needs an array<float|double> vector, got $t")
  }
}

/** `struct(codes, sse)` PQ encode — see [[PqOps]]. `residual = true` fuses the
  * `vec - centroids[cell]` subtraction into the same pass ([[PqEncodeNative]]
  * companion builds the Column forms). Never null: degenerate inputs produce
  * (-1, MaxValue) subspaces exactly like the HOF form. */
case class PqEncodeNative(vec: Expression, cell: Expression,
                          cents: Array[Double], dim: Int,
                          cb: Array[Double], m: Int, k: Int, subDim: Int,
                          residual: Boolean) extends Expression {
  require(m >= 1 && k >= 1 && subDim >= 1 && cb.length == m * k * subDim,
    "codebooks must be rectangular m*k*subDim")

  override def children: Seq[Expression] = Seq(vec, cell)
  override def nullable: Boolean = false
  override def prettyName: String = "graft_pq_encode"
  override def dataType: DataType = StructType(Seq(
    StructField("codes", ArrayType(IntegerType, containsNull = false), nullable = false),
    StructField("sse", DoubleType, nullable = false)))

  private lazy val vecF = PqOps.isFloatArr(vec, prettyName)

  override def eval(input: InternalRow): Any = {
    val v = vec.eval(input)
    val c = cell.eval(input)
    PqOps.encodeRow(v.asInstanceOf[ArrayData], vecF,
      c == null, if (c == null) -1 else c.asInstanceOf[Int],
      cents, dim, cb, m, k, subDim, residual)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val vecG = vec.genCode(ctx)
    val cellG = cell.genCode(ctx)
    val centsRef = ctx.addReferenceObj("pqCents", cents, "double[]")
    val cbRef = ctx.addReferenceObj("pqCb", cb, "double[]")
    ev.copy(code = code"""
      |${vecG.code}
      |${cellG.code}
      |InternalRow ${ev.value} = graft.expr.PqOps.encodeRow(
      |  ${vecG.isNull} ? null : ${vecG.value}, $vecF,
      |  ${cellG.isNull}, ${cellG.isNull} ? -1 : ${cellG.value},
      |  $centsRef, $dim, $cbRef, $m, $k, $subDim, $residual);
      |""".stripMargin, isNull = FalseLiteral)
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(vec = newChildren(0), cell = newChildren(1))
}

object PqEncodeNative {
  private def flatten(cb: Seq[Seq[Seq[Double]]]): (Array[Double], Int, Int, Int) = {
    val m = cb.size; val k = cb.head.size; val subDim = cb.head.head.size
    require(cb.forall(s => s.size == k && s.forall(_.size == subDim)),
      "codebooks must be rectangular")
    (cb.flatten.flatten.toArray, m, k, subDim)
  }

  /** Plain PQ encode: `struct(codes, sse)` of `vec` against `codebooks`. */
  def expr(vec: Column, codebooks: Seq[Seq[Seq[Double]]]): Column = {
    val (flat, m, k, subDim) = flatten(codebooks)
    GraftSqlBridge.column(PqEncodeNative(GraftSqlBridge.expression(vec),
      GraftSqlBridge.expression(org.apache.spark.sql.functions.lit(0)),
      Array.empty[Double], 0, flat, m, k, subDim, residual = false))
  }

  /** Fused residual encode: `struct(codes, sse)` of `vec - centroids[cell]`
    * against `codebooks`, one pass, no residual array materialized. */
  def residualExpr(vec: Column, cell: Column, centroids: Seq[Seq[Double]],
                   codebooks: Seq[Seq[Seq[Double]]]): Column = {
    val (flat, m, k, subDim) = flatten(codebooks)
    val dim = centroids.head.size
    require(centroids.forall(_.size == dim), "centroids must be rectangular")
    GraftSqlBridge.column(PqEncodeNative(GraftSqlBridge.expression(vec),
      GraftSqlBridge.expression(cell.cast("int")),
      centroids.flatten.toArray, dim, flat, m, k, subDim, residual = true))
  }
}

/** Native IVF cell assignment — see [[PqOps.assignRow]]. */
case class IvfAssignNative(vec: Expression, cents: Array[Double], dim: Int)
  extends Expression {
  require(dim >= 1 && cents.length % dim == 0, "centroids must be rectangular")

  override def children: Seq[Expression] = Seq(vec)
  override def nullable: Boolean = false
  override def prettyName: String = "graft_ivf_assign"
  override def dataType: DataType = IntegerType

  private lazy val vecF = PqOps.isFloatArr(vec, prettyName)
  private def nCent: Int = cents.length / dim

  override def eval(input: InternalRow): Any = {
    val v = vec.eval(input)
    PqOps.assignRow(v.asInstanceOf[ArrayData], vecF, cents, dim, nCent)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val vecG = vec.genCode(ctx)
    val centsRef = ctx.addReferenceObj("ivfCents", cents, "double[]")
    ev.copy(code = code"""
      |${vecG.code}
      |int ${ev.value} = graft.expr.PqOps.assignRow(
      |  ${vecG.isNull} ? null : ${vecG.value}, $vecF, $centsRef, $dim, $nCent);
      |""".stripMargin, isNull = FalseLiteral)
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(vec = newChildren(0))
}

object IvfAssignNative {
  def expr(vec: Column, centroids: Seq[Seq[Double]]): Column = {
    val dim = centroids.head.size
    require(centroids.forall(_.size == dim), "centroids must be rectangular")
    GraftSqlBridge.column(IvfAssignNative(GraftSqlBridge.expression(vec),
      centroids.flatten.toArray, dim))
  }
}
