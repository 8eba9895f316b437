package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Codegen'd word n-gram shingle array — the hot kernel of every
  * shingle-based dedup/contamination surface (n-gram Jaccard, MinHash
  * signatures, shared-span positions, benchmark decontamination).
  *
  * Bit-equivalent to the zip_with-over-slices spelling it replaces
  * ([[graft.ops.Dedup.shingleArrayExpr]]'s r5 form):
  *
  *   CASE WHEN size(t) < n THEN array()
  *   ELSE zip_with(...zip_with(slice(t,1,m), slice(t,2,m),
  *          (x,y) -> concat(x,' ',y))..., slice(t,n,m), ...) END
  *
  * - one output element per window start, joined by single spaces with
  *   concat's null-propagation (a NULL token nulls its windows — split()
  *   never produces one, but the semantics are preserved exactly);
  * - size(t) < n yields the empty array, NULL input yields NULL.
  *
  * Why not the HOF chain: interpreted per row, and each evaluation
  * materializes n slice copies + n−1 zip_with intermediates of the token
  * array before the final concat pass. This is one loop emitting the
  * output windows directly — no intermediate arrays, whole-stage codegen
  * via a static helper (the TokenCount discipline).
  */
case class ShingleArray(child: Expression, n: Int) extends UnaryExpression {
  require(n >= 1, s"shingle width must be >= 1, got $n")

  override def dataType: DataType = ArrayType(StringType, containsNull = true)

  override def nullSafeEval(v: Any): Any =
    ShingleUtil.shingles(v.asInstanceOf[ArrayData], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.ShingleUtil.shingles($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): ShingleArray =
    copy(child = newChild)
}

object ShingleUtil {
  private val Space = UTF8String.fromString(" ")

  def shingles(t: ArrayData, n: Int): ArrayData = {
    val sz = t.numElements()
    if (sz < n) return new GenericArrayData(Array.empty[Any])
    val out = new Array[Any](sz - n + 1)
    val parts = new Array[UTF8String](2 * n - 1)
    var j = 0
    while (j < n - 1) { parts(2 * j + 1) = Space; j += 1 }
    var i = 0
    while (i <= sz - n) {
      var isNull = false
      var k = 0
      while (k < n && !isNull) {
        if (t.isNullAt(i + k)) isNull = true
        else parts(2 * k) = t.getUTF8String(i + k)
        k += 1
      }
      out(i) = if (isNull) null else UTF8String.concat(parts: _*)
      i += 1
    }
    new GenericArrayData(out)
  }
}

object ShingleArray {
  import org.apache.spark.sql.GraftSqlShim
  /** Column-level entry point: `ShingleArray(toks, n)`. */
  def apply(toks: Column, n: Int): Column =
    GraftSqlShim.column(new ShingleArray(GraftSqlShim.expression(toks), n))
}
