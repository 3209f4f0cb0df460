package graft.expr

import org.apache.spark.sql.{Column, GraftSqlBridge, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.{FunctionIdentifier, InternalRow}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Cast, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{BooleanType, DataType, DoubleType}

/** P4 — ray-casting point-in-polygon as a NATIVE Catalyst expression
  * (`/root/reference/scripts/3_qaqc_data/qaqc_wholestation.py:231-267` does this with
  * shapely objects per station).
  *
  * Why an `Expression` and not a UDF: the generated code participates in whole-stage
  * codegen (no boxing, no Scala-function dispatch per row, vertices live in a
  * JVM-local `double[]` reference), and `nullIntolerant` gives Catalyst license to
  * push null filters through it. The vertex arrays are constructor constants — the
  * polygon is a broadcast-sized literal, exactly like the reference's WECC shape.
  * Interpreted fallback ([[nullSafeEval]]) and codegen ([[doGenCode]]) share the same
  * algorithm; parity between the two paths is asserted in ExprSpec.
  */
case class PointInPolygon(left: Expression, right: Expression,
                          xs: Array[Double], ys: Array[Double])
  extends BinaryExpression {
  require(xs.length == ys.length && xs.length >= 3, "polygon needs >= 3 vertices")

  // children are cast to double by both entry points ([[PointInPolygon.expr]] and
  // [[PointInPolygon.fromArgs]]), so no ExpectsInputTypes machinery is needed
  override def dataType: DataType = BooleanType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "graft_point_in_polygon"

  override def nullSafeEval(x: Any, y: Any): Any =
    PointInPolygon.contains(xs, ys, x.asInstanceOf[Double], y.asInstanceOf[Double])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val xsRef = ctx.addReferenceObj("pipXs", xs, "double[]")
    val ysRef = ctx.addReferenceObj("pipYs", ys, "double[]")
    nullSafeCodeGen(ctx, ev, (px, py) => {
      val inside = ctx.freshName("inside")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      s"""
         |boolean $inside = false;
         |int $j = $xsRef.length - 1;
         |for (int $i = 0; $i < $xsRef.length; $i++) {
         |  if ((($ysRef[$i] > $py) != ($ysRef[$j] > $py)) &&
         |      $px < ($xsRef[$j] - $xsRef[$i]) * ($py - $ysRef[$i])
         |            / ($ysRef[$j] - $ysRef[$i]) + $xsRef[$i]) {
         |    $inside = !$inside;
         |  }
         |  $j = $i;
         |}
         |${ev.value} = $inside;
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object PointInPolygon {

  /** The shared ray-cast kernel (even-odd rule, open rightward ray). */
  def contains(xs: Array[Double], ys: Array[Double], px: Double, py: Double): Boolean = {
    var inside = false
    var j = xs.length - 1
    var i = 0
    while (i < xs.length) {
      if ((ys(i) > py) != (ys(j) > py) &&
        px < (xs(j) - xs(i)) * (py - ys(i)) / (ys(j) - ys(i)) + xs(i)) inside = !inside
      j = i; i += 1
    }
    inside
  }

  /** Column-API entry: `pointInPolygon(col("lon"), col("lat"), wecc)`. */
  def expr(x: Column, y: Column, poly: Seq[(Double, Double)]): Column =
    GraftSqlBridge.column(PointInPolygon(
      GraftSqlBridge.expression(x.cast("double")), GraftSqlBridge.expression(y.cast("double")),
      poly.map(_._1).toArray, poly.map(_._2).toArray))

  /** SQL builder: `graft_point_in_polygon(x, y, array(xs...), array(ys...))`. The two
    * vertex arrays must be literal (foldable) — they are folded to constants at plan
    * time so the generated code sees plain `double[]`s, not per-row array reads. */
  def fromArgs(args: Seq[Expression]): Expression = {
    require(args.length == 4,
      "graft_point_in_polygon(x, y, xs_array, ys_array) takes exactly 4 arguments")
    def constArray(e: Expression): Array[Double] = {
      require(e.foldable, "polygon vertex arrays must be literal")
      e.eval(InternalRow.empty).asInstanceOf[ArrayData].toDoubleArray()
    }
    PointInPolygon(Cast(args(0), DoubleType), Cast(args(1), DoubleType),
      constArray(args(2)), constArray(args(3)))
  }
}

/** Session extension registering the native functions for SQL use:
  * `spark.sql.extensions=graft.expr.GraftExtensions`. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      new FunctionIdentifier("graft_point_in_polygon"),
      new ExpressionInfo(classOf[PointInPolygon].getName, "graft_point_in_polygon"),
      (args: Seq[Expression]) => PointInPolygon.fromArgs(args)))
    ext.injectFunction((
      new FunctionIdentifier("graft_md5_hash60"),
      new ExpressionInfo(classOf[Md5Hash60].getName, "graft_md5_hash60"),
      (args: Seq[Expression]) => {
        require(args.length == 1, "graft_md5_hash60(s) takes exactly 1 argument")
        Md5Hash60(Cast(args.head, org.apache.spark.sql.types.StringType))
      }))
    ext.injectFunction((
      new FunctionIdentifier("graft_norm_fingerprint"),
      new ExpressionInfo(classOf[NormFingerprint].getName, "graft_norm_fingerprint"),
      (args: Seq[Expression]) => {
        require(args.length == 1, "graft_norm_fingerprint(s) takes exactly 1 argument")
        NormFingerprint(Cast(args.head, org.apache.spark.sql.types.StringType))
      }))
    ext.injectFunction((
      new FunctionIdentifier("graft_simhash32"),
      new ExpressionInfo(classOf[SimHash32].getName, "graft_simhash32"),
      (args: Seq[Expression]) => {
        require(args.length == 1, "graft_simhash32(h32_array) takes exactly 1 argument")
        SimHash32(args.head)
      }))
    ext.injectFunction((
      new FunctionIdentifier("graft_minhash_sig"),
      new ExpressionInfo(classOf[MinHashSig].getName, "graft_minhash_sig"),
      (args: Seq[Expression]) => {
        require(args.length == 3,
          "graft_minhash_sig(h32_array, as_array, bs_array) takes exactly 3 arguments")
        def constLongs(e: Expression): Array[Long] = {
          require(e.foldable, "minhash coefficient arrays must be literal")
          e.eval(InternalRow.empty).asInstanceOf[ArrayData].toLongArray()
        }
        MinHashSig(args.head, constLongs(args(1)), constLongs(args(2)))
      }))
    ext.injectFunction((
      new FunctionIdentifier("graft_winnow_select"),
      new ExpressionInfo(classOf[WinnowSelect].getName, "graft_winnow_select"),
      (args: Seq[Expression]) => {
        require(args.length == 2,
          "graft_winnow_select(hash_array, w) takes exactly 2 arguments")
        require(args(1).foldable, "window width must be literal")
        WinnowSelect(args.head,
          args(1).eval(InternalRow.empty).asInstanceOf[Number].intValue())
      }))
    ext.injectFunction((
      new FunctionIdentifier("graft_vec_dot"),
      new ExpressionInfo(classOf[VecDot].getName, "graft_vec_dot"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "graft_vec_dot(a, b) takes exactly 2 arguments")
        VecDot(args.head, args(1))
      }))
    ext.injectFunction((
      new FunctionIdentifier("graft_cosine"),
      new ExpressionInfo(classOf[CosineSim].getName, "graft_cosine"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "graft_cosine(a, b) takes exactly 2 arguments")
        CosineSim(args.head, args(1))
      }))
  }
}
