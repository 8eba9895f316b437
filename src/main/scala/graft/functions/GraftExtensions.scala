package graft.functions

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.types.IntegerType

/** SQL surface for the engine's codegen expressions.
  *
  * Spark-first registration path (system-level: `SparkSessionExtensions`
  * is how a library exposes Catalyst expressions to plain-SQL users — the
  * reference has no SQL layer at all; its accessors are Python-only,
  * /root/reference/xcorr/core/accessors.py):
  *
  *   - at build time: `--conf spark.sql.extensions=graft.functions.GraftExtensions`
  *     or `.withExtensions(new GraftExtensions)`;
  *   - on a session someone else built: `GraftExtensions.register(spark)`
  *     (injects into the live session's FunctionRegistry via the shim —
  *     extensions configured after a session exists are otherwise ignored).
  *
  * The functions stay the SAME case-class Expressions the Column API uses
  * (TokenCount / ChunkDecode / DensifyFloat), so `spark.sql("...")` users
  * get identical semantics AND identical whole-stage-codegen plans — no
  * UDF wrapper, no extra conversion.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftExtensions.functions.foreach(ext.injectFunction)
}

object GraftExtensions {
  private def one(name: String, build: Expression => Expression)
      : (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) =
    (FunctionIdentifier(name),
      new ExpressionInfo(getClass.getName, name),
      args => {
        require(args.length == 1, s"$name expects 1 argument, got ${args.length}")
        build(args.head)
      })

  /** (identifier, info, builder) triples in `injectFunction` shape. */
  val functions: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    one("graft_token_count", TokenCount(_)),
    one("graft_chunk_decode", ChunkDecode(_)),
    (FunctionIdentifier("graft_densify_float"),
      new ExpressionInfo(getClass.getName, "graft_densify_float"),
      args => {
        require(args.length == 2,
          s"graft_densify_float expects (points, npts), got ${args.length} arguments")
        val npts = args(1) match {
          case Literal(v: Int, IntegerType) => v
          case e if e.foldable && e.dataType == IntegerType =>
            e.eval().asInstanceOf[Int]
          case other => throw new IllegalArgumentException(
            s"graft_densify_float npts must be an integer literal, got $other")
        }
        DensifyFloat(args.head, npts)
      }),
    (FunctionIdentifier("graft_zorder"),
      new ExpressionInfo(getClass.getName, "graft_zorder"),
      args => {
        require(args.length == 2,
          s"graft_zorder expects (a, b), got ${args.length} arguments")
        Zorder.widened(args.head, args(1))
      }),
    (FunctionIdentifier("graft_dot"),
      new ExpressionInfo(getClass.getName, "graft_dot"),
      args => {
        require(args.length == 2,
          s"graft_dot expects (a, b), got ${args.length} arguments")
        DotProduct(args.head, args(1))
      }),
    (FunctionIdentifier("graft_l2sq"),
      new ExpressionInfo(getClass.getName, "graft_l2sq"),
      args => {
        require(args.length == 4,
          s"graft_l2sq expects (a, b, off, len), got ${args.length} arguments")
        L2Sq(args.head, args(1), args(2), args(3))
      }),
    (FunctionIdentifier("graft_shingles"),
      new ExpressionInfo(getClass.getName, "graft_shingles"),
      args => {
        require(args.length == 2,
          s"graft_shingles expects (tokens, n), got ${args.length} arguments")
        val n = args(1) match {
          case Literal(v: Int, IntegerType) => v
          case e if e.foldable && e.dataType == IntegerType =>
            e.eval().asInstanceOf[Int]
          case other => throw new IllegalArgumentException(
            s"graft_shingles n must be an integer literal, got $other")
        }
        ShingleArray(args.head, n)
      }),
    one("graft_tokens", TokenArray(_, dropEmpties = false)),
    one("graft_words", TokenArray(_, dropEmpties = true)),
    (FunctionIdentifier("graft_md5int"),
      new ExpressionInfo(getClass.getName, "graft_md5int"),
      args => {
        require(args.length == 2,
          s"graft_md5int expects (str, nHex), got ${args.length} arguments")
        val n = args(1) match {
          case Literal(v: Int, IntegerType) => v
          case e if e.foldable && e.dataType == IntegerType =>
            e.eval().asInstanceOf[Int]
          case other => throw new IllegalArgumentException(
            s"graft_md5int nHex must be an integer literal, got $other")
        }
        Md5PrefixInt(args.head, n)
      }))

  /** Register into an ALREADY-RUNNING session (current + future queries). */
  def register(spark: SparkSession): Unit =
    functions.foreach { case (id, info, builder) =>
      org.apache.spark.sql.GraftSqlShim.registerFunction(spark, id, info, builder)
    }
}
