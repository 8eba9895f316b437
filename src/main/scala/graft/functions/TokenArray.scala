package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Zero-regex whitespace tokenizer — the array-producing sibling of
  * [[TokenCount]], for the paths that need the tokens themselves
  * (shingles, MinHash, simhash, retrieval terms, word-quality counts).
  *
  * `dropEmpties = false` is bit-equivalent to
  * `split(trim(text), '\\s+')`: SQL trim strips SPACES (0x20) only; Java
  * regex split with its implicit -1 limit then yields one field per
  * maximal `\s`-run boundary, so text whose trimmed form starts (ends)
  * with other whitespace — a tab, a newline — contributes a leading
  * (trailing) EMPTY field, and blank input yields `[""]`.
  *
  * `dropEmpties = true` is bit-equivalent to
  * `filter(split(trim(text), '\\s+'), w -> w != '')` — the words form the
  * quality/retrieval ops use.
  *
  * Whitespace = Java regex '\s' = [ \t\n\x0B\f\r], ASCII-only, exactly
  * the [[TokenCountUtil.isSpace]] set (multi-byte UTF-8 code points have
  * the high bit set and are never whitespace). One byte pass, one byte[]
  * copy per row, fields are offset-views into it — no regex Matcher, no
  * String[] garbage; measured ~127 µs/row for the regex form on real
  * transcripts at 32 threads (the r4 TokenCount finding), ~2 orders less
  * here. Participates in whole-stage codegen via the static helper.
  */
case class TokenArray(child: Expression, dropEmpties: Boolean)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def nullSafeEval(v: Any): Any =
    TokenArrayUtil.split(v.asInstanceOf[UTF8String], dropEmpties)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.TokenArrayUtil.split($c, $dropEmpties)")

  override protected def withNewChildInternal(newChild: Expression): TokenArray =
    copy(child = newChild)
}

object TokenArrayUtil {
  import TokenCountUtil.isSpace

  def split(s: UTF8String, dropEmpties: Boolean): ArrayData = {
    val bytes = s.getBytes // one copy; field UTF8Strings point into it
    var lo = 0
    var hi = bytes.length
    // SQL trim: spaces only
    while (lo < hi && bytes(lo) == 0x20) lo += 1
    while (hi > lo && bytes(hi - 1) == 0x20) hi -= 1
    if (lo == hi) { // blank after space-trim: split -> [""], words -> []
      return new GenericArrayData(
        if (dropEmpties) Array.empty[Any]
        else Array[Any](UTF8String.EMPTY_UTF8))
    }
    val out = new java.util.ArrayList[Any](8)
    // leading non-space ws run => leading empty field (Java split keeps it)
    if (!dropEmpties && isSpace(bytes(lo))) out.add(UTF8String.EMPTY_UTF8)
    var i = lo
    while (i < hi) {
      if (isSpace(bytes(i))) i += 1
      else {
        val start = i
        while (i < hi && !isSpace(bytes(i))) i += 1
        out.add(UTF8String.fromBytes(bytes, start, i - start))
      }
    }
    // trailing ws run => trailing empty field
    if (!dropEmpties && isSpace(bytes(hi - 1))) out.add(UTF8String.EMPTY_UTF8)
    new GenericArrayData(out.toArray)
  }
}

object TokenArray {
  import org.apache.spark.sql.GraftSqlShim
  /** Column-level entry points. */
  def apply(c: Column): Column = apply(c, dropEmpties = false)
  def apply(c: Column, dropEmpties: Boolean): Column =
    GraftSqlShim.column(new TokenArray(GraftSqlShim.expression(c), dropEmpties))
}
