package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Codegen'd double dot product of two numeric arrays — the hot kernel of
  * every embedding-similarity surface (brute/LSH/IVF cosine, centroid
  * assignment, hyperplane signs).
  *
  * Bit-equivalent to the higher-order-function spelling it replaces:
  *
  *   aggregate(zip_with(CAST_D(a), CAST_D(b), (x, y) -> x * y),
  *             0D, (acc, v) -> acc + v)
  *
  * - float elements widen to double BEFORE the multiply (exact, same as
  *   the `transform(a, x -> cast(x as double))` the HOF form ate first);
  * - the sum is the same left fold from +0.0 in ascending index order —
  *   identical IEEE op sequence, identical result bits;
  * - NULL in = NULL out exactly where the HOF form is NULL: either array
  *   NULL, any element NULL, or length mismatch (zip_with pads the short
  *   side with NULL products, which poison the fold).
  *
  * Why not the HOF form: higher-order functions do not participate in
  * whole-stage codegen and allocate per row (zip_with materializes the
  * product array, transform the cast copy — 3+ transient arrays per dot).
  * This expression is one fused loop over the two ArrayData buffers: no
  * allocation, codegen-inlined, and the per-row cost drops ~an order of
  * magnitude on 64-dim vectors (measured on q40, OPTIMIZATION_r06.md).
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  private def isFloat(e: Expression): Boolean =
    e.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(a: Any, b: Any): Any =
    DotProductUtil.dot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData],
      isFloat(left), isFloat(right))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      def get(arr: String, f: Boolean) =
        if (f) s"(double) $arr.getFloat($i)" else s"$arr.getDouble($i)"
      s"""
         |final int $n = $x.numElements();
         |if ($n != $y.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $acc = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($x.isNullAt($i) || $y.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    $acc += ${get(x, isFloat(left))} * ${get(y, isFloat(right))};
         |  }
         |  if (!${ev.isNull}) { ${ev.value} = $acc; }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}

object DotProductUtil {
  /** Interpreted twin of the generated loop; null = the HOF form's NULL. */
  def dot(a: ArrayData, b: ArrayData, aF: Boolean, bF: Boolean): java.lang.Double = {
    val n = a.numElements()
    if (n != b.numElements()) return null
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val x = if (aF) a.getFloat(i).toDouble else a.getDouble(i)
      val y = if (bF) b.getFloat(i).toDouble else b.getDouble(i)
      acc += x * y
      i += 1
    }
    acc
  }

  /** Squared-L2 over `len`-wide slices at 0-based `off`, with slice's
    * clamp-at-end semantics (see [[L2Sq]]); null where the HOF form is
    * NULL (unequal effective slice lengths, or a null element in range).
    */
  def l2sq(a: ArrayData, b: ArrayData, off: Int, len: Int,
           aF: Boolean, bF: Boolean): java.lang.Double = {
    if (off < 0 || len < 0) return null // slice errors on these upstream; never produced here
    val la = math.max(0, math.min(len.toLong, a.numElements().toLong - off)).toInt
    val lb = math.max(0, math.min(len.toLong, b.numElements().toLong - off)).toInt
    if (la != lb) return null
    var acc = 0.0
    var j = 0
    while (j < la) {
      val i = off + j
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val x = if (aF) a.getFloat(i).toDouble else a.getDouble(i)
      val y = if (bF) b.getFloat(i).toDouble else b.getDouble(i)
      val dxy = x - y
      acc += dxy * dxy
      j += 1
    }
    acc
  }
}

object DotProduct {
  import org.apache.spark.sql.GraftSqlShim
  /** Column-level entry point: `DotProduct(a, b)`. */
  def apply(a: Column, b: Column): Column =
    GraftSqlShim.column(new DotProduct(
      GraftSqlShim.expression(a), GraftSqlShim.expression(b)))
}

/** Codegen'd squared-L2 over aligned `len`-wide slices (0-based `off`) of
  * two numeric arrays — the PQ sub-distance kernel. Bit-equivalent to
  *
  *   aggregate(zip_with(slice(CAST_D(a), off + 1, len),
  *                      slice(CAST_D(b), off + 1, len),
  *                      (x, y) -> (x - y) * (x - y)),
  *             0D, (acc, p) -> acc + p)
  *
  * including the edge semantics: slice clamps at the array end, so the
  * effective slice lengths are min(len, size − off) per side; unequal
  * effective lengths make zip_with pad with NULL products, which poison
  * the fold → NULL here too. A full-array L2 (the q82 brute kernel) is
  * `off = 0, len = Int.MaxValue`. Same motivation as [[DotProduct]]: the
  * HOF form allocates 5 transient arrays per evaluation and blocks
  * whole-stage codegen.
  */
case class L2Sq(first: Expression, second: Expression,
                third: Expression, fourth: Expression)
    extends org.apache.spark.sql.catalyst.expressions.QuaternaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  private def isFloat(e: Expression): Boolean =
    e.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(a: Any, b: Any, off: Any, len: Any): Any =
    DotProductUtil.l2sq(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData],
      off.asInstanceOf[Int], len.asInstanceOf[Int],
      isFloat(first), isFloat(second))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y, off, len) => {
      val r = ctx.freshName("r")
      s"""
         |java.lang.Double $r = graft.functions.DotProductUtil.l2sq(
         |  $x, $y, $off, $len, ${isFloat(first)}, ${isFloat(second)});
         |if ($r == null) { ${ev.isNull} = true; } else { ${ev.value} = $r.doubleValue(); }
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression,
      newThird: Expression, newFourth: Expression): L2Sq =
    copy(first = newFirst, second = newSecond,
      third = newThird, fourth = newFourth)
}

object L2Sq {
  import org.apache.spark.sql.GraftSqlShim
  def apply(a: Column, b: Column, off: Column, len: Column): Column =
    GraftSqlShim.column(new L2Sq(
      GraftSqlShim.expression(a), GraftSqlShim.expression(b),
      GraftSqlShim.expression(off), GraftSqlShim.expression(len)))
}
