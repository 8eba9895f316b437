package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-level term salience — the TF-IDF / BM25 family an LLM-corpus
  * pipeline uses for keyword extraction, stop-list derivation and quality
  * weighting (Robertson & Zaragoza 2009, "The Probabilistic Relevance
  * Framework: BM25 and Beyond").
  *
  * Two scoring surfaces, deliberately split:
  *
  *  - [[topTerms]] scores with the RATIONAL BM25 idf argument
  *    `(N - df + 0.5) / (df + 0.5)` and no logarithm. Every operation in
  *    that expression is a correctly-rounded IEEE double op on small
  *    integers, so the scores are bit-identical across engines and the
  *    result sits under the driver's DuckDB hash gate unrounded-ranked.
  *    `ln` is NOT bit-portable: measured on this box, DuckDB's `ln` and
  *    Java's `Math.log` disagree by 1 ulp at df=398 of N=500 — a
  *    hash-gated score must not contain it. The log is monotone, so
  *    PER-TERM ranking by the rational idf equals ranking by log idf
  *    (tf-weighted mixes can differ; the gated surface defines its own
  *    tf×rational-idf order and documents it).
  *  - [[bm25]] is the standard log-idf Okapi BM25 (k1/b saturation) for
  *    API users; it is spec-gated against hand-computed values in Scala
  *    (OpsSpec) rather than the cross-engine hash gate, for the ulp reason
  *    above.
  *
  * Scale shape: one explode + groupBy (doc,term) for tf, one groupBy
  * (term) for df, one join tf⋈df on term, one window by doc for the
  * top-k. The df join is a real join rather than
  * `count(*) OVER (PARTITION BY term)` on purpose: a stop word's window
  * partition holds a row for nearly EVERY document (one hot partition at
  * corpus scale), while the aggregated df table is vocabulary-sized and
  * AQE picks broadcast vs shuffled (and splits skewed term keys) at the
  * join. N (total docs) rides in as a broadcast 1-row cross join.
  */
object TextRank {

  /** (doc_id, term, tf) — whitespace tokens of trim(text), same
    * tokenization as q32/q33 and [[Dedup.tokens]].
    */
  def termFreq(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol).as("doc_id"), explode(Dedup.tokens(col(textCol))).as("term"))
      .groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))

  /** Top-`k` terms per document by `tf * ((N - df + 0.5) / (df + 0.5))`
    * (rational BM25 idf argument — see the object doc for why no log),
    * ties broken by term ascending. Output: doc_id, term, tf, term_df,
    * score (rounded 6 for display; the RANK uses the unrounded bit-exact
    * double), rnk.
    */
  def topTerms(df: DataFrame, idCol: String, textCol: String, k: Int = 3): DataFrame = {
    val tf = termFreq(df, idCol, textCol)
    val dfTab = tf.groupBy("term").agg(count(lit(1)).as("term_df"))
    val n = df.agg(count(lit(1)).as("n_docs"))
    val scored = tf.join(dfTab, "term")
      .crossJoin(broadcast(n))
      // Column-API literals, NOT expr("... + 0.5"): a bare 0.5 in Spark
      // SQL text parses as DECIMAL(1,1) and drags the whole expression
      // into decimal arithmetic (different rounding rules per engine);
      // lit(0.5) is a true IEEE double. Tree: left-assoc long subtract,
      // exact +0.5 widening, one divide, one multiply — every step
      // correctly rounded IEEE, bit-equal to the oracle's ::DOUBLE form.
      .withColumn("__score", col("tf") *
        ((col("n_docs") - col("term_df") + lit(0.5)) / (col("term_df") + lit(0.5))))
    val w = Window.partitionBy("doc_id").orderBy(col("__score").desc, col("term").asc)
    scored.withColumn("rnk", row_number().over(w))
      .where(col("rnk") <= k)
      .select(col("doc_id"), col("term"), col("tf"), col("term_df"),
        round(col("__score"), 6).as("score"), col("rnk"))
  }

  /** Standard Okapi BM25 per (doc, term): idf = ln(1 + (N-df+0.5)/(df+0.5)),
    * tf saturation with k1 and length normalization b against the corpus
    * mean document length. Spec-gated in Scala (not the cross-engine hash
    * gate — `ln` differs by 1 ulp between libms).
    */
  def bm25(df: DataFrame, idCol: String, textCol: String,
           k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    val tf = termFreq(df, idCol, textCol)
    val dfTab = tf.groupBy("term").agg(count(lit(1)).as("term_df"))
    val lens = df.select(col(idCol).as("doc_id"),
      size(Dedup.tokens(col(textCol))).as("dl"))
    val n = df.agg(count(lit(1)).as("n_docs"),
      avg(size(Dedup.tokens(col(textCol)))).as("avg_dl"))
    tf.join(dfTab, "term").join(lens, "doc_id").crossJoin(broadcast(n))
      .withColumn("idf", log(lit(1.0) + (col("n_docs") - col("term_df") + 0.5) / (col("term_df") + 0.5)))
      .withColumn("bm25",
        col("idf") * (col("tf") * (k1 + 1.0)) /
          (col("tf") + lit(k1) * (lit(1.0 - b) + lit(b) * col("dl") / col("avg_dl"))))
      .select("doc_id", "term", "tf", "term_df", "dl", "idf", "bm25")
  }
}

/** Train/test contamination detection — flag corpus documents whose word
  * n-gram shingles overlap a benchmark/holdout set (the n-gram-overlap
  * decontamination rule of Brown et al. 2020, GPT-3 appendix C, run as a
  * set join instead of per-example scans).
  *
  * Scale shape: the benchmark side is tiny relative to the corpus
  * (thousands of eval documents vs billions of training documents), so
  * its distinct shingle set broadcasts; the corpus side is one linear
  * shingle pass + one groupBy(doc). AQE picks broadcast vs shuffled on
  * real sizes, same policy as [[Dedup.ngramJaccard]]'s stop-shingle join.
  * Documents shorter than `n` tokens have no shingles and are absent from
  * the output (mirrored in the oracle).
  */
object Contamination {

  /** Per non-benchmark document: distinct shingle count, how many of those
    * shingles appear in ANY benchmark document, the hit rate, and a flag at
    * `n_hit / n_sh >= thresholdPct/100` — evaluated as integer
    * cross-multiplication so the FLAG needs no float discipline at all.
    * Output: doc_id, n_sh, n_hit, rate (round 6; int/int IEEE divide is
    * bit-portable), contaminated.
    */
  def flag(df: DataFrame, idCol: String, textCol: String,
           benchPred: Column, n: Int = 5, thresholdPct: Int = 10): DataFrame =
    flagAgainst(df.where(!benchPred), df.where(benchPred), idCol, textCol, n, thresholdPct)

  /** Same contract with the two sides as explicit frames — lets a caller
    * screen an already-filtered corpus against a holdout drawn from the
    * ORIGINAL corpus (eval sets are never quality-filtered), as
    * [[Curation.curate]] does.
    */
  def flagAgainst(target: DataFrame, bench: DataFrame, idCol: String, textCol: String,
                  n: Int = 5, thresholdPct: Int = 10): DataFrame = {
    val benchSh = Dedup.shingles(bench, idCol, textCol, n)
      .select(col("sh")).distinct().withColumn("__hit", lit(1))
    val tgtSh = Dedup.shingles(target, idCol, textCol, n)
    tgtSh.join(benchSh, Seq("sh"), "left")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_sh"), count(col("__hit")).as("n_hit"))
      .select(col("doc_id"), col("n_sh"), col("n_hit"),
        round(col("n_hit") / col("n_sh"), 6).as("rate"),
        (col("n_hit") * 100 >= col("n_sh") * thresholdPct).as("contaminated"))
  }
}
