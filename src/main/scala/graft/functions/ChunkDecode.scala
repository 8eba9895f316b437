package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import graft.codec.ChunkBlob

/** Decode a Gorilla/delta-of-delta chunk blob (graft.codec.ChunkBlob) into
  * an array<struct<ts: timestamp, value: double>> — the rollup read path
  * (graft.ops.Rollup.fromChunks) as a native codegen'd Expression.
  *
  * The earlier Scala-UDF decode paid per-chunk CatalystTypeConverters
  * (java.sql.Timestamp boxing + Seq[Tuple2] -> Catalyst array conversion)
  * and broke whole-stage codegen on every rollup read; here the decode
  * writes InternalRows directly (timestamps stay epoch-micros longs — the
  * blob's own representation, so decode is conversion-free end-to-end).
  */
object ChunkDecodeUtil {
  def decode(blob: Array[Byte]): ArrayData = {
    val (ts, vs) = ChunkBlob.decode(blob)
    val rows = new Array[Any](ts.length)
    var i = 0
    while (i < ts.length) {
      rows(i) = new GenericInternalRow(Array[Any](ts(i), vs(i)))
      i += 1
    }
    new GenericArrayData(rows)
  }
}

case class ChunkDecode(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("ts", TimestampType, nullable = false),
      StructField("value", DoubleType, nullable = false))),
    containsNull = false)

  override def nullSafeEval(v: Any): Any =
    ChunkDecodeUtil.decode(v.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.ChunkDecodeUtil.decode($c)")

  override protected def withNewChildInternal(newChild: Expression): ChunkDecode =
    copy(child = newChild)
}

object ChunkDecode {
  import org.apache.spark.sql.GraftSqlShim
  /** Column entry point: `ChunkDecode($"chunk_blob")`. */
  def apply(c: Column): Column = GraftSqlShim.column(new ChunkDecode(GraftSqlShim.expression(c)))
}
