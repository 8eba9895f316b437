package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType}
import org.apache.spark.unsafe.types.UTF8String

/** First `n` hex-digit values (nibbles, 0..15) of md5(input) as an
  * array<int> — the SimHash per-token bit source, fused.
  *
  * Bit-equivalent to the r5 spelling
  *
  *   conv(substring(md5(tok), d, 1), 16, 10)  for d = 1..n
  *
  * evaluated per digit: hex digit d of the digest is the high (odd d) or
  * low (even d) nibble of digest byte (d−1)/2. The r5 form cost one md5
  * hex-string render plus n substring+conv string conversions per token
  * row (~7.6M conv calls per signature pass at sf0.1); this is one digest
  * plus n shifts, with the MessageDigest instance reused per thread
  * (Spark's own md5() builds one per call via commons-codec).
  */
case class Md5Nibbles(child: Expression, n: Int) extends UnaryExpression {
  require(n >= 1 && n <= 32, s"md5 has 32 hex digits, got n=$n")

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def nullSafeEval(v: Any): Any =
    Md5NibblesUtil.nibbles(v.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Md5NibblesUtil.nibbles($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): Md5Nibbles =
    copy(child = newChild)
}

object Md5NibblesUtil {
  private val digest = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  def nibbles(s: UTF8String, n: Int): ArrayData = {
    val md = digest.get()
    md.reset()
    val d = md.digest(s.getBytes)
    val out = new Array[Int](n)
    var i = 0
    while (i < n) {
      val b = d(i / 2) & 0xff
      out(i) = if (i % 2 == 0) b >>> 4 else b & 0xf
      i += 1
    }
    ArrayData.toArrayData(out)
  }

  def prefixInt(s: UTF8String, nHex: Int): Int = {
    val md = digest.get()
    md.reset()
    val d = md.digest(s.getBytes)
    var v = 0
    var i = 0
    while (i < nHex) {
      val b = d(i / 2) & 0xff
      v = (v << 4) | (if (i % 2 == 0) b >>> 4 else b & 0xf)
      i += 1
    }
    v
  }
}

object Md5Nibbles {
  import org.apache.spark.sql.GraftSqlShim
  def apply(c: Column, n: Int): Column =
    GraftSqlShim.column(new Md5Nibbles(GraftSqlShim.expression(c), n))
}

/** Integer value of the first `nHex` hex digits of md5(input) — the
  * sketch-family cell/bucket hash, fused. Bit-equivalent to
  *
  *   cast(conv(substr(md5(x), 1, nHex), 16, 10) as int)
  *
  * (nHex <= 7, so the value < 16^7 < 2^31 and the cast never wraps).
  * Same motivation as [[Md5Nibbles]]: one digest + shifts per row in
  * place of an md5 hex render + substr + string base conversion, with
  * the MessageDigest reused per thread.
  */
case class Md5PrefixInt(child: Expression, nHex: Int) extends UnaryExpression {
  require(nHex >= 1 && nHex <= 7, s"nHex must be in [1,7], got $nHex")

  override def dataType: DataType = IntegerType

  override def nullSafeEval(v: Any): Any =
    Md5NibblesUtil.prefixInt(v.asInstanceOf[UTF8String], nHex)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Md5NibblesUtil.prefixInt($c, $nHex)")

  override protected def withNewChildInternal(newChild: Expression): Md5PrefixInt =
    copy(child = newChild)
}

object Md5PrefixInt {
  import org.apache.spark.sql.GraftSqlShim
  def apply(c: Column, nHex: Int): Column =
    GraftSqlShim.column(new Md5PrefixInt(GraftSqlShim.expression(c), nHex))
}
