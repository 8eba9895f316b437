package graft.core

import scala.util.matching.Regex

/** Pair-id codec — the engine's analog of the reference's receiver-pair
  * utilities (`check_receiver` SEED-id regex + `split_pair` dash split,
  * /root/reference/xcorr/util/receiver.py:38-157). The stored pair string
  * is `"convA-convB"` with convA < convB (init.py:154 codec); conversation
  * ids may THEMSELVES contain dashes (`conv-000042`), so splitting is
  * validated against an id pattern and must be unambiguous — the analog of
  * the reference validating each half against the SEED regex.
  */
object PairCodec {

  /** Default id shape of the synthetic generator; callers with other id
    * schemes pass their own pattern (↔ check_receiver's SEED regex).
    */
  val DefaultIdPattern: Regex = "conv-\\d{6}".r

  def join(a: String, b: String): String = {
    require(a < b, s"pair ids must be ordered: '$a' !< '$b'")
    s"$a-$b"
  }

  /** Split a pair string into its two ids, validating both halves against
    * `idPattern` and requiring exactly one valid split point (ids with
    * dashes make a naive split('-') ambiguous).
    */
  def split(pair: String, idPattern: Regex = DefaultIdPattern): (String, String) = {
    def full(s: String): Boolean = idPattern.pattern.matcher(s).matches()
    val candidates = pair.indices
      .filter(i => pair.charAt(i) == '-')
      .map(i => (pair.substring(0, i), pair.substring(i + 1)))
      .filter { case (a, b) => full(a) && full(b) }
    require(candidates.nonEmpty, s"'$pair' does not split into two ids matching $idPattern")
    require(candidates.size == 1,
      s"'$pair' splits ambiguously under $idPattern: ${candidates.mkString(", ")}")
    candidates.head
  }

  /** True iff the string is a canonical (ordered, unambiguous) pair id. */
  def isValid(pair: String, idPattern: Regex = DefaultIdPattern): Boolean =
    try { val (a, b) = split(pair, idPattern); a < b }
    catch { case _: IllegalArgumentException => false }
}
