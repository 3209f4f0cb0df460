package graft.expr

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** The dedup family's 60-bit md5 shingle hash as a NATIVE Catalyst expression.
  *
  * Bit-identical to the composed form `conv(substring(md5(s), 1, 15), 16, 10)
  * .cast("long")` — the first 15 hex characters of an md5 digest ARE its first 60
  * bits, so the value is just (first 8 digest bytes, big-endian) >>> 4 — but without
  * materializing a 32-character hex string and re-parsing it per shingle. The hash
  * runs once per shingle per document across every MinHash/SimHash/winnowing path
  * (the measured growth term of the dedup family, SCALE.md r7 table), so the
  * hex-round-trip it removes is pure overhead on the hot path. Oracle queries keep
  * the composed SQL form — values are identical by construction, and Md5Hash60Spec
  * pins the equivalence plus codegen/interpreted parity.
  *
  * The digest object is thread-local (one per task thread, reset per row) — no
  * allocation, no contention inside whole-stage codegen.
  */
case class Md5Hash60(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "graft_md5_hash60"

  override def nullSafeEval(input: Any): Any =
    Md5Hash60.hash(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expr.Md5Hash60.hash($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object Md5Hash60 {
  private val md = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** First 60 bits of md5(s): big-endian first 8 digest bytes >>> 4. */
  def hash(s: UTF8String): Long = {
    val d = md.get()
    d.reset()
    val digest = d.digest(s.getBytes)
    var v = 0L
    var i = 0
    while (i < 8) { v = (v << 8) | (digest(i) & 0xffL); i += 1 }
    v >>> 4
  }

  /** Column-API entry; input is cast to string like the composed form it replaces. */
  def expr(c: Column): Column =
    GraftSqlBridge.column(Md5Hash60(GraftSqlBridge.expression(c.cast("string"))))
}
