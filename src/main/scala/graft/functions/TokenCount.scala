package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, IntegerType}
import org.apache.spark.unsafe.types.UTF8String

/** Zero-allocation whitespace token counter.
  *
  * Semantically identical to `size(split(trim(text), '\\s+'))` for non-blank
  * input and 0 for blank input (the engine's token_volume definition), but a
  * single pass over the UTF8 bytes with no regex, no Matcher, and no
  * String[] garbage. The regex form showed up as the dominant CPU + memory
  * bandwidth cost of ingest at 32 threads (UTF8String.split in every hot
  * thread dump, ~127 µs/row); this expression is ~two orders of magnitude
  * cheaper and participates in whole-stage codegen via a static helper.
  *
  * Whitespace = Java regex '\s' = [ \t\n\x0B\f\r] (ASCII only — exactly what
  * the DuckDB oracle's '\s+' matches on this data). Multi-byte UTF-8 code
  * points have the high bit set, so they are never mistaken for whitespace.
  */
object TokenCountUtil {
  def isSpace(b: Byte): Boolean =
    b == 0x20 || b == 0x09 || b == 0x0a || b == 0x0b || b == 0x0c || b == 0x0d

  def count(s: UTF8String): Int = {
    val n = s.numBytes()
    var tokens = 0
    var inToken = false
    var i = 0
    while (i < n) {
      val b = s.getByte(i)
      if (isSpace(b)) inToken = false
      else if (!inToken) { tokens += 1; inToken = true }
      i += 1
    }
    tokens
  }
}

case class TokenCount(child: Expression) extends UnaryExpression {
  override def dataType: DataType = IntegerType

  override def nullSafeEval(v: Any): Any =
    TokenCountUtil.count(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TokenCountUtil.count($c)")

  override protected def withNewChildInternal(newChild: Expression): TokenCount =
    copy(child = newChild)
}

object TokenCount {
  import org.apache.spark.sql.GraftSqlShim
  /** Column-level entry point: `token_count($"text")`. */
  def apply(c: Column): Column = GraftSqlShim.column(new TokenCount(GraftSqlShim.expression(c)))
}
