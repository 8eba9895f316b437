package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Cast, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}

/** Morton / Z-order curve interleave — the STORAGE-LAYOUT key that makes
  * two-dimensional pruning work at 100 TB: sort (or range-partition) a
  * table by `zorder(series_bucket, time_bucket)` before writing and a
  * parquet row-group's min/max stats become tight on BOTH dimensions, so
  * a query slicing EITHER by key or by time range skips most of the
  * file bytes (Morton 1966; the technique behind Delta/Iceberg
  * `OPTIMIZE ZORDER BY`). The reference's layout analog is its
  * file-per-(pair, year, doy) directory scheme
  * (/root/reference/xcorr/io/filesystem.py:28-97) — one fixed nesting
  * order, good for time slices only; the z-curve serves both axes from
  * one sort order.
  *
  * Semantics: the low 32 bits of each input land in the even (first
  * argument) and odd (second argument) bit positions of the 64-bit
  * result — `z = spread(a & 0xFFFFFFFF) | (spread(b & 0xFFFFFFFF) << 1)`
  * with the classic 5-step magic-number bit spread. Pure integer ops —
  * exact, engine-replayable (the q126 oracle runs the identical
  * shift/mask chain in SQL), and codegen'd via a static helper so the
  * whole-stage pipeline never breaks.
  */
object ZorderUtil {
  /** Spread the low 32 bits of x so bit i lands at bit 2i. */
  def spread(x: Long): Long = {
    var v = x & 0xFFFFFFFFL
    v = (v | (v << 16)) & 0x0000FFFF0000FFFFL
    v = (v | (v << 8)) & 0x00FF00FF00FF00FFL
    v = (v | (v << 4)) & 0x0F0F0F0F0F0F0F0FL
    v = (v | (v << 2)) & 0x3333333333333333L
    v = (v | (v << 1)) & 0x5555555555555555L
    v
  }

  def interleave(a: Long, b: Long): Long =
    spread(a) | (spread(b) << 1)
}

case class Zorder(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == LongType && right.dataType == LongType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_zorder expects (BIGINT, BIGINT), got " +
        s"(${left.dataType.sql}, ${right.dataType.sql})")

  override def nullSafeEval(a: Any, b: Any): Any =
    ZorderUtil.interleave(a.asInstanceOf[Long], b.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.functions.ZorderUtil.interleave($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Zorder =
    copy(left = newLeft, right = newRight)
}

object Zorder {
  import org.apache.spark.sql.GraftSqlShim
  /** Widen RESOLVED non-long inputs to LongType so INT columns just work
    * from the Column API; unresolved SQL arguments pass through (they
    * either resolve to BIGINT or get the checkInputDataTypes message). */
  def widened(a: Expression, b: Expression): Zorder = {
    def w(e: Expression) =
      if (e.resolved && e.dataType != LongType) Cast(e, LongType) else e
    Zorder(w(a), w(b))
  }
  /** Column-level entry point: `zorder($"bucket", $"minuteIdx")`. */
  def apply(a: Column, b: Column): Column =
    GraftSqlShim.column(widened(
      GraftSqlShim.expression(a), GraftSqlShim.expression(b)))
}
