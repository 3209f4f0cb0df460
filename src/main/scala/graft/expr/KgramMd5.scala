package graft.expr

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Rolling k-gram 60-bit md5 hashes over a token array as ONE native expression.
  *
  * The composed form (`transform(sequence(1, n-k+1), i -> md5(concat_ws(' ',
  * slice(toks, i, k))))`) copies a k-element array AND builds a gram string per
  * position — O(n·k) interpreted allocation per document before the digest even
  * runs. Here the token bytes are extracted once per row and each gram streams
  * straight through the digest (`update(token); update(' ')`) — no slices, no
  * gram strings, one codegen'd call.
  *
  * Bit-identical to the composed form (KgramMd5Spec pins equivalence and
  * codegen/interpreted parity; the t3/d13 oracles, which inline the slice form
  * in SQL, stay bit-exact):
  *  - n < k  → one gram of ALL tokens (the `when(size < k, ...)` branch);
  *  - null tokens are skipped WITHOUT a separator, exactly like `concat_ws`
  *    (cannot occur from `tokens()`, but parity is parity);
  *  - the hash is md5's first 60 bits, [[Md5Hash60]]'s contract. */
case class KgramMd5(child: Expression, k: Int) extends UnaryExpression {
  require(k >= 1, "k must be >= 1")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "graft_kgram_md5"

  override def nullSafeEval(input: Any): Any =
    KgramMd5.hashes(input.asInstanceOf[ArrayData], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expr.KgramMd5.hashes($c, $k)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object KgramMd5 {
  private val mdLocal = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }
  private val Space = Array(' '.toByte)

  def hashes(toks: ArrayData, k: Int): ArrayData = {
    val n = toks.numElements()
    // token bytes extracted ONCE; null slots stay null and are skipped like
    // concat_ws skips them
    val bytes = new Array[Array[Byte]](n)
    var i = 0
    while (i < n) {
      if (!toks.isNullAt(i)) bytes(i) = toks.getUTF8String(i).getBytes
      i += 1
    }
    val md = mdLocal.get()
    def gram(from: Int, until: Int): Long = {
      md.reset()
      var first = true
      var j = from
      while (j < until) {
        if (bytes(j) != null) {
          if (!first) md.update(Space)
          md.update(bytes(j))
          first = false
        }
        j += 1
      }
      val d = md.digest()
      var v = 0L
      var b = 0
      while (b < 8) { v = (v << 8) | (d(b) & 0xffL); b += 1 }
      v >>> 4
    }
    if (n < k) return new GenericArrayData(Array[Any](gram(0, n)))
    val out = new Array[Any](n - k + 1)
    i = 0
    while (i <= n - k) { out(i) = gram(i, i + k); i += 1 }
    new GenericArrayData(out)
  }

  /** Column-API entry over an `array<string>` token column. */
  def expr(toks: Column, k: Int): Column =
    GraftSqlBridge.column(KgramMd5(GraftSqlBridge.expression(toks), k))
}
