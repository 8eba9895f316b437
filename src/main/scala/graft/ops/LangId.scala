package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Character-n-gram language identification — the Cavnar-Trenkle (1994)
  * "N-Gram-Based Text Categorization" heuristic every corpus pipeline runs
  * before language-specific quality filters: score each document against
  * frozen per-language trigram profiles and take the argmax.
  *
  * The profiles here are rank-weighted top-20 trigram lists for en/de/es
  * (space-padded, from the published frequency tables — public knowledge);
  * the mechanism is profile-agnostic and callers can pass their own. All
  * scores are exact BIGINT sums of integer weights, so the result is
  * engine-independent and hash-oracle-able (q117); ties go to the
  * alphabetically first language and `margin` (best minus runner-up) is
  * the usual reliability signal for an `und`/unknown cutoff downstream.
  *
  * Scale shape: a pure per-row map over the scan — zero shuffle, zero UDF.
  * Trigrams are built with the zip_with-over-slices idiom (see
  * TextQuality.gramsExpr: Catalyst re-evaluates expressions referenced
  * inside lambda BODIES once per element when the optimizer inlines them;
  * zip_with arguments are evaluated once per row, keeping the worst case
  * O(chars) however often the tree is duplicated). Profile lookups are
  * element_at over a FOLDABLE map literal — constant-folded once, ~20-entry
  * scan per gram.
  */
object LangId {

  /** rank-weighted (20..1) top trigrams; space = word boundary (padded). */
  val profiles: Map[String, Seq[(String, Long)]] = Map(
    "en" -> Seq(" th", "the", "he ", "ed ", " an", "and", "nd ", " of", "of ",
      " in", "ing", "ng ", " to", "to ", "er ", " co", "at ", "en ", " re", "ion"),
    "de" -> Seq("en ", "er ", " de", "der", "ie ", " di", "die", "ch ", "ein",
      "ne ", "sch", "in ", "che", "nde", " ei", "ung", "ten", " un", "ge ", "cht"),
    "es" -> Seq(" de", "de ", "os ", " la", "la ", "el ", " el", "as ", "es ",
      " en", "en ", " co", "ue ", " es", "ent", " se", "nte", "ado", "que", " qu")
  ).map { case (l, ts) => l -> ts.zipWithIndex.map { case (t, i) => (t, (ts.size - i).toLong) } }

  /** `' ' || trim(squeeze(lower(text), non-letters -> ' ')) || ' '` — the
    * padded a-z+space alphabet both engines agree on byte-for-byte.
    */
  private def normSql(textCol: String): String =
    s"concat(' ', trim(regexp_replace(lower(coalesce($textCol, '')), '[^a-z]+', ' ')), ' ')"

  /** char trigrams of a string expr, zip_with-over-slices (no in-lambda
    * re-evaluation); empty below 3 chars (sequence() counts DOWN on an
    * empty range — guard, don't trust it).
    */
  private def triExpr(strSql: String): String = {
    val cs = s"split($strSql, '')"
    def part(j: Int) = s"slice($cs, ${j + 1}, size($cs) - 2)"
    s"CASE WHEN length($strSql) < 3 THEN array() ELSE " +
      s"zip_with(zip_with(${part(0)}, ${part(1)}, (x, y) -> concat(x, y)), ${part(2)}, " +
      s"(x, y) -> concat(x, y)) END"
  }

  private def scoreExpr(gramsCol: String, prof: Seq[(String, Long)]): Column = {
    val m = prof.map { case (t, wt) => s"'${t}', CAST($wt AS BIGINT)" }.mkString("map(", ", ", ")")
    expr(s"aggregate($gramsCol, CAST(0 AS BIGINT), (acc, g) -> " +
      s"acc + coalesce(element_at($m, g), CAST(0 AS BIGINT)))")
  }

  /** Adds `s_<lang>` BIGINT columns, `lang_pred` (argmax, alpha-first tie)
    * and `margin` (best - runner-up; 0 margin = unreliable).
    */
  def classify(df: DataFrame, textCol: String,
               prof: Map[String, Seq[(String, Long)]] = profiles): DataFrame = {
    val langs = prof.keys.toSeq.sorted
    val withGrams = df.withColumn("_g", expr(triExpr(normSql(textCol))))
    val scored = langs.foldLeft(withGrams)((d, l) =>
      d.withColumn(s"s_$l", scoreExpr("_g", prof(l)))).drop("_g")
    val best = greatest(langs.map(l => col(s"s_$l")): _*)
    val total = langs.map(l => col(s"s_$l")).reduce(_ + _)
    val runnerUp =
      if (langs.size == 2) total - best
      else total - best - least(langs.map(l => col(s"s_$l")): _*) // 3 langs
    require(langs.size <= 3, "runner-up extraction above covers <= 3 profiles")
    val pred = langs.foldRight(lit(langs.last): Column)((l, e) =>
      when(col(s"s_$l") === best, lit(l)).otherwise(e))
    scored.withColumn("lang_pred", pred).withColumn("margin", best - runnerUp)
  }
}
