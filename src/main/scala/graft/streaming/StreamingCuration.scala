package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.ops.{Dedup, Sampling, TextQuality}

/** Incremental corpus curation — the streaming face of
  * [[graft.ops.Curation]] for live document feeds, with each batch stage
  * re-expressed in its streaming-legal form:
  *
  *   - quality filter: [[TextQuality.annotate]] — a pure per-row codegen
  *     map, stateless
  *   - decontamination: per-row `array_intersect` of the doc's distinct
  *     shingles against the holdout's shingle set inlined as a LITERAL
  *     array. The batch operator's set join needs a per-doc groupBy,
  *     which a stream can only finalize behind a watermark; an eval
  *     holdout is bounded by construction (thousands of docs), so its
  *     distinct shingles are collected once at plan time instead.
  *     `maxHoldoutShingles` (default 200k) guards the assumption and
  *     points bigger holdouts at the batch path: the literal rides in
  *     EVERY serialized task plan, and Spark's ArrayIntersect rebuilds
  *     its hash set per row evaluation, so each doc pays O(holdout) —
  *     fine at eval-set sizes, quadratic-feeling far above them
  *   - exact dedup: [[StreamingDedup.distinctDocs]] — first occurrence of
  *     each content hash passes; state bounded by the watermark horizon
  *   - split: [[Sampling.hashSplit]] — stateless map
  *
  * Equality to the batch pipeline is spec-gated on sealed in-order input
  * (where first-seen == min-id, the only semantic the two dedup faces
  * don't share).
  */
object StreamingCuration {

  def curate(docs: DataFrame, bench: DataFrame, benchPred: Column,
             idCol: String = "doc_id", textCol: String = "text", tsCol: String = "ts",
             horizon: String = "10 minutes", minWords: Int = 5, shingleN: Int = 5,
             thresholdPct: Int = 10, maxHoldoutShingles: Int = 200_000): DataFrame = {
    require(minWords >= shingleN,
      s"minWords ($minWords) must be >= shingleN ($shingleN) so every survivor has shingles")
    // the one driver-side read in the streaming pipeline: the STATIC
    // holdout's distinct shingles, bounded by the eval set's size
    val benchArr = Dedup.shingles(bench, idCol, textCol, shingleN)
      .select("sh").distinct().limit(maxHoldoutShingles + 1)
      .collect().map(_.getString(0))
    require(benchArr.length <= maxHoldoutShingles,
      s"holdout exceeds $maxHoldoutShingles distinct shingles — use the batch " +
        "Curation path (set join) for holdouts this large")
    val benchLit = typedLit(benchArr.sorted.toSeq)

    // shingleArrayExpr resolves to the registered graft_shingles kernel
    graft.functions.GraftExtensions.register(docs.sparkSession)
    val filtered = TextQuality.annotate(docs.where(!benchPred), textCol)
      .where(!col("is_repetitive") && col("n_words") >= minWords)
    val decontaminated = filtered
      .withColumn("__toks", Dedup.tokens(col(textCol)))
      .withColumn("__sh",
        array_distinct(expr(Dedup.shingleArrayExpr("__toks", shingleN))))
      .withColumn("n_sh", size(col("__sh")))
      .withColumn("n_hit", size(array_intersect(col("__sh"), benchLit)))
      .where(!(col("n_hit") * 100 >= col("n_sh") * thresholdPct))
      .drop("__toks", "__sh")
    val deduped = StreamingDedup.distinctDocs(decontaminated, textCol, tsCol, horizon)
    Sampling.hashSplit(deduped, idCol)
      .select(col(idCol), col(tsCol), col("n_words"), col("n_sh"), col("n_hit"),
        col("bucket"), col("split"))
  }
}
