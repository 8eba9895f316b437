package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The full corpus-curation pipeline, composed from the individually
  * hash-gated stages — the documents-side flagship the way
  * gap-fill→allPairs→FFT-CC (q50) is the timeseries-side one:
  *
  *   1. quality filter — drop repetitive docs ([[TextQuality.repetition]],
  *      the Gopher dup-line/dup-2gram rule) and docs under `minWords`
  *   2. exact dedup — keep only each md5(text) group's min-id doc
  *      ([[Dedup.exact]] keeper rule), applied to the quality survivors
  *   3. decontamination — drop survivors whose `shingleN`-gram overlap
  *      with the holdout reaches `thresholdPct` ([[Contamination]]); the
  *      holdout's shingles come from the ORIGINAL corpus (eval sets are
  *      never quality-filtered), and holdout docs themselves leave the
  *      training corpus
  *   4. split — deterministic hash-bucket train/val/test assignment
  *      ([[Sampling.hashSplit]])
  *
  * Every decision is integer or string domain (counts, md5, cross-
  * multiplied thresholds) — the whole composition hash-oracles with zero
  * float discipline. Scale shape is the sum of its parts: two bounded
  * groupBys (md5 groups, shingle join), broadcastable holdout, and pure
  * maps; `minWords >= shingleN` guarantees every survivor HAS shingles,
  * so the decontamination join is total over the survivors (no
  * absent-row semantics to mirror).
  */
object Curation {

  /** Output: idCol, n_words, n_sh, n_hit, bucket, split — one row per doc
    * that survives all three filters, with its split assignment.
    *
    * Holdout docs participate in stages 1–2 (a holdout doc can be the
    * exact-dedup keeper that knocks out its training-corpus duplicate —
    * the duplicate of an eval document must NOT train) and leave the
    * output at stage 3.
    */
  def curate(df: DataFrame, idCol: String, textCol: String, benchPred: Column,
             minWords: Int = 5, shingleN: Int = 5, thresholdPct: Int = 10): DataFrame =
    curateAgainst(df, df.where(benchPred), benchPred, idCol, textCol,
      minWords, shingleN, thresholdPct)

  /** Curate against an EXTERNAL holdout (a benchmark table that is not
    * part of the corpus): every corpus doc is a training candidate, the
    * holdout contributes only its shingle set.
    */
  def curateAgainst(df: DataFrame, bench: DataFrame, idCol: String, textCol: String,
                    minWords: Int, shingleN: Int, thresholdPct: Int): DataFrame =
    curateAgainst(df, bench, lit(false), idCol, textCol, minWords, shingleN, thresholdPct)

  private def curateAgainst(df: DataFrame, bench: DataFrame, benchPred: Column,
                            idCol: String, textCol: String,
                            minWords: Int, shingleN: Int, thresholdPct: Int): DataFrame = {
    require(minWords >= shingleN,
      s"minWords ($minWords) must be >= shingleN ($shingleN) so every survivor has shingles")
    // annotate, not repetition+join: the profile columns ride along with
    // the text in one per-row map, so stage 1 is a single corpus scan
    // with zero shuffle instead of a full-corpus self-join
    val s1 = TextQuality.annotate(df, textCol)
      .where(!col("is_repetitive") && col("n_words") >= minWords)
    val keepers = s1.groupBy(md5(col(textCol)).as("__h"))
      .agg(min(col(idCol)).as("__keeper"))
    val s2 = s1.withColumn("__h", md5(col(textCol)))
      .join(keepers, "__h")
      .where(col(idCol) === col("__keeper"))
      .drop("__h", "__keeper")
    val cont = Contamination.flagAgainst(
      s2.where(!benchPred), bench, idCol, textCol, shingleN, thresholdPct)
    s2.join(
        cont.where(!col("contaminated"))
          .select(col("doc_id").as(idCol), col("n_sh"), col("n_hit")),
        idCol)
      .transform(x => Sampling.hashSplit(x, idCol))
      .select(idCol, "n_words", "n_sh", "n_hit", "bucket", "split")
  }
}
