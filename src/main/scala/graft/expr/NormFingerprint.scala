package graft.expr

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** The exact-dedup document fingerprint `md5(concat_ws(" ", tokens(lower(text))))`
  * as a NATIVE Catalyst expression: one pass over the string — lowercase (the SAME
  * `UTF8String.toLowerCase` the `Lower` expression calls, so parity holds by
  * construction), collapse ASCII-whitespace runs to single spaces (Java regex `\s`
  * is ASCII-only, which is what `split(trim(s), "\\s+")` matched), md5, hex.
  *
  * The composed form allocated a token ARRAY, a joined string, and regex state per
  * row on every exact-dedup path (d1 exact dedup, d9 decontamination, d11 paragraph
  * dedup, the pipe2 curation funnel, t10 distinct-doc stats). Byte-wise whitespace
  * scanning is safe in UTF-8: continuation bytes are >= 0x80 and can never collide
  * with the ASCII separators. Values are bit-identical — every oracle keeps the
  * composed SQL form; NormFingerprintSpec pins equivalence (unicode case folding,
  * mixed whitespace, empties) and codegen/interpreted parity. */
case class NormFingerprint(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "graft_norm_fingerprint"

  override def nullSafeEval(input: Any): Any =
    NormFingerprint.fingerprint(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expr.NormFingerprint.fingerprint($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object NormFingerprint {
  private val md = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }
  private val HexChars = "0123456789abcdef".getBytes

  def fingerprint(s: UTF8String): UTF8String = {
    val b = s.toLowerCase.getBytes
    val norm = new Array[Byte](b.length)
    var o = 0
    var pendingSpace = false
    var i = 0
    while (i < b.length) {
      val c = b(i)
      val ws = c == ' ' || c == '\t' || c == '\n' || c == 0x0b || c == '\f' || c == '\r'
      if (ws) { if (o > 0) pendingSpace = true }
      else {
        if (pendingSpace) { norm(o) = ' '; o += 1; pendingSpace = false }
        norm(o) = c; o += 1
      }
      i += 1
    }
    val d = md.get()
    d.reset()
    d.update(norm, 0, o)
    val digest = d.digest()
    val hex = new Array[Byte](32)
    var j = 0
    while (j < 16) {
      hex(2 * j) = HexChars((digest(j) >> 4) & 0xf)
      hex(2 * j + 1) = HexChars(digest(j) & 0xf)
      j += 1
    }
    UTF8String.fromBytes(hex)
  }

  /** Column-API entry; input cast to string like the composed form it replaces. */
  def expr(c: Column): Column =
    GraftSqlBridge.column(NormFingerprint(GraftSqlBridge.expression(c.cast("string"))))
}
