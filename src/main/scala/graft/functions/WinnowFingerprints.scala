package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Winnowing document fingerprints (Schleimer/Daswani/Aiken, SIGMOD 2003 —
  * the MOSS algorithm): k-gram Rabin-Karp rolling hashes, then per sliding
  * window of `w` consecutive hashes select the RIGHTMOST minimal one; the
  * distinct selected (pos, hash) set is the document's fingerprint — the
  * "document fingerprinting (rolling hash)" stage of a training-data dedup
  * pipeline. The guarantee (Theorem 1 of the paper): any shared substring
  * of length >= k + w - 1 between two documents yields at least one shared
  * fingerprint, while storing only ~2/(w+1) of all hashes.
  *
  * Normalization (identical integer arithmetic in the DuckDB oracle, q115):
  * keep only ASCII letters/digits of the text, uppercase folded by +32 —
  * whitespace, punctuation and every non-ASCII codepoint are DROPPED, so
  * fingerprints survive reflow/punctuation edits (the paper's motivation).
  * Positions are 1-based offsets into that FILTERED character sequence.
  *
  * Hash: h(i) = sum_j c(i+j) * 257^(k-1-j) mod 1e9+7, computed rolling in
  * O(1) per position; window minima via an ascending-minima deque (pop
  * back while >= incoming, so ties resolve to the rightmost — the paper's
  * rule, making fingerprints position-robust). One pass, zero allocation
  * beyond the output, participates in whole-stage codegen via the static
  * helper (same pattern as [[TokenCount]] / [[ChunkDecode]]).
  *
  * Reference analog: xcorr hashes waveforms for reproducibility
  * (/root/reference/xcorr/util/hasher.py:70-319); this is the content-
  * similarity counterpart for the text corpus.
  */
object WinnowUtil {
  final val Base = 257L
  final val Mod  = 1000000007L

  /** ASCII-fold one UTF-8 byte: lowercase letter/digit kept, else -1. */
  private def fold(b: Byte): Int = {
    val c = b & 0xff
    if (c >= 'a' && c <= 'z') c
    else if (c >= 'A' && c <= 'Z') c + 32
    else if (c >= '0' && c <= '9') c
    else -1 // whitespace, punctuation, every multi-byte UTF-8 byte (high bit)
  }

  def fingerprints(s: UTF8String, k: Int, w: Int): ArrayData = {
    val nb = s.numBytes()
    // filtered char codes (ASCII-only, so bytes == codepoints here)
    val cs = new Array[Int](nb)
    var n = 0
    var i = 0
    while (i < nb) {
      val c = fold(s.getByte(i))
      if (c >= 0) { cs(n) = c; n += 1 }
      i += 1
    }
    val m = n - k + 1 // number of k-gram hashes
    if (m < 1) return new GenericArrayData(Array.empty[Any])
    // rolling hashes
    var pow = 1L // 257^(k-1) mod M
    i = 1
    while (i < k) { pow = pow * Base % Mod; i += 1 }
    val hs = new Array[Long](m)
    var h = 0L
    i = 0
    while (i < k) { h = (h * Base + cs(i)) % Mod; i += 1 }
    hs(0) = h
    i = 1
    while (i < m) {
      h = ((h - cs(i - 1) * pow % Mod + Mod) % Mod * Base + cs(i + k - 1)) % Mod
      hs(i) = h
      i += 1
    }
    // ascending-minima deque over windows of w hashes; rightmost-min ties
    val dq = new Array[Int](m) // indices into hs
    var lo = 0; var hi = 0     // [lo, hi) live deque span
    val out = new java.util.ArrayList[Any]()
    var lastSel = -1
    i = 0
    while (i < m) {
      while (hi > lo && hs(dq(hi - 1)) >= hs(i)) hi -= 1 // >= : rightmost wins
      dq(hi) = i; hi += 1
      if (dq(lo) <= i - w) lo += 1
      val wStart = i - w + 1
      if (wStart >= 0 || i == m - 1) { // every full window; short doc -> one window
        val sel = dq(lo)
        if (sel != lastSel) {
          out.add(InternalRow(sel + 1, hs(sel))) // 1-based position
          lastSel = sel
        }
      }
      i += 1
    }
    new GenericArrayData(out.toArray)
  }
}

/** array<struct<pos:int, fp:bigint>> of winnowing fingerprints of `child`. */
case class WinnowFingerprints(child: Expression, k: Int, w: Int)
    extends UnaryExpression {
  require(k >= 1 && w >= 1, s"winnow k/w must be >= 1, got k=$k w=$w")

  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("pos", IntegerType, nullable = false),
                   StructField("fp", LongType, nullable = false))),
    containsNull = false)

  override def nullSafeEval(v: Any): Any =
    WinnowUtil.fingerprints(v.asInstanceOf[UTF8String], k, w)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.WinnowUtil.fingerprints($c, $k, $w)")

  override protected def withNewChildInternal(newChild: Expression): WinnowFingerprints =
    copy(child = newChild)
}

object WinnowFingerprints {
  import org.apache.spark.sql.GraftSqlShim
  /** Column entry point: `WinnowFingerprints($"text", k, w)`. */
  def apply(c: Column, k: Int, w: Int): Column =
    GraftSqlShim.column(new WinnowFingerprints(GraftSqlShim.expression(c), k, w))
}
