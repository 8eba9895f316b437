package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Hybrid retrieval: a lexical leg, a vector leg, and reciprocal-rank
  * fusion (Cormack et al. 2009) — the serving-side composition a corpus
  * pipeline runs against its own index (find training docs "about" a
  * probe, dedup candidates for audit, eval-set mining). Everything is
  * rank-domain: the fused score is a sum of 1/(k + rank) over at most a
  * handful of legs, so per-(query, doc) it's a tiny commutative IEEE sum —
  * deterministic across engines with no rounding discipline needed.
  */
object Retrieval {

  /** Lexical leg: integer term-overlap retrieval — score(q, d) =
    * |distinct(terms(q)) ∩ distinct(terms(d))|, ranked (overlap DESC, id)
    * per query, top `n`. The integer score keeps the whole leg
    * hash-exact; swap in BM25 (graft.ops.TextRank) when float ranking is
    * acceptable.
    *
    * Scale shape: docs explode to DISTINCT (doc, term) once (map-side
    * partial distinct); the probe side is tiny and broadcasts, so the
    * term equi-join never shuffles the corpus by term — and the per-query
    * candidate count is bounded by the docs sharing at least one term.
    * The final rank is one window per query over those candidates only.
    *
    * @param queries (qIdCol, textCol) — the probe documents
    * @param excludeSelf drop candidates whose id EQUALS the probe id —
    *   only meaningful when probes are drawn from the corpus itself and
    *   share its id domain (the q98 usage). Pass false for external
    *   probes with their own id space, or id collisions silently drop
    *   legitimate hits.
    */
  def termOverlapTopN(docs: DataFrame, idCol: String, textCol: String,
      queries: DataFrame, qIdCol: String, n: Int,
      excludeSelf: Boolean = true): DataFrame = {
    def terms(df: DataFrame, id: Column, alias: String) = df.select(
      id.as(alias),
      explode(expr(
        s"array_distinct(graft_words($textCol))")).as("__w"))
    val dt = terms(docs, col(idCol), "__doc")
    val qt = terms(queries, col(qIdCol), "q_id")
    val ov = dt.join(broadcast(qt), "__w")
      .where(if (excludeSelf) col("__doc") =!= col("q_id") else lit(true))
      .groupBy(col("q_id"), col("__doc"))
      .agg(count(lit(1)).as("overlap"))
    val w = Window.partitionBy(col("q_id")).orderBy(col("overlap").desc, col("__doc"))
    ov.withColumn("rk", row_number().over(w)).where(col("rk") <= n)
      .select(col("q_id"), col("__doc").as(idCol), col("overlap"), col("rk"))
  }

  /** Reciprocal-rank fusion over ranked legs: rrf(q, d) = Σ_legs
    * 1/(k + rank_leg(q, d)), docs missing from a leg contribute 0; output
    * re-ranked (rrf DESC, id) per query, top `topN`. Each leg carries
    * (q_id, idCol, rk). One union + one partial-aggregated groupBy + one
    * window over ≤ Σ leg sizes rows per query — the legs already bounded
    * the candidates, fusion never touches the corpus.
    */
  def rrfFuse(legs: Seq[DataFrame], idCol: String, k: Int = 60,
      topN: Int = 10): DataFrame = {
    require(legs.nonEmpty, "need at least one leg")
    require(k >= 1, s"k must be >= 1, got $k")
    val unioned = legs.map(_.select(col("q_id"), col(idCol), col("rk")))
      .reduce(_ unionByName _)
    val fused = unioned
      .groupBy(col("q_id"), col(idCol))
      .agg(sum(lit(1.0) / (lit(k) + col("rk"))).as("rrf"))
    val w = Window.partitionBy(col("q_id")).orderBy(col("rrf").desc, col(idCol))
    fused.withColumn("rank", row_number().over(w)).where(col("rank") <= topN)
  }

  /** Exact PHRASE search over a positional index — the consecutive-terms
    * query the bag-of-words legs above cannot answer: a doc matches a
    * phrase iff every phrase term appears at consecutive token positions.
    *
    * Distributed shape (the classic positional-postings plan): posexplode
    * both sides into (id, pos, term) / (q_id, i, term) rows, ONE equi-join
    * on the term, and anchor arithmetic — a row matching phrase offset i
    * at doc position pos votes for anchor `pos − i`; an anchor with
    * exactly phrase-length votes is a full occurrence (each (i, pos) pair
    * is unique, so count(*) counts matched offsets). One map-side-combined
    * agg per (q, doc, anchor), one per (q, doc).
    *
    * The phrase side is tiny (broadcast); join fan-out is Σ_term df(term)
    * over phrase terms — the inherent posting-list cost. At corpus scale,
    * pre-filter candidates on the phrase's RAREST term before the full
    * join (the standard optimization) — here the join IS that plan for
    * every term at once, and AQE splits a skewed stop-term key.
    *
    * Output per (q_id, doc): `n_hits` (distinct anchors), `first_pos`
    * (min anchor, 0-based) — exact integers.
    */
  def phraseSearch(docs: DataFrame, idCol: String, textCol: String,
                   phrases: DataFrame, qIdCol: String,
                   phraseCol: String): DataFrame = {
    def toks(df: DataFrame, id: Column, alias: String, text: String) =
      df.select(id.as(alias),
        posexplode(expr(s"graft_words($text)"))
          .as(Seq(s"${alias}_pos", "__w")))
    val dt = toks(docs, col(idCol), "__doc", textCol)
    val qt = toks(phrases, col(qIdCol), "q_id", phraseCol)
    val qlen = phrases.select(col(qIdCol).as("q_id"),
      expr(s"size(graft_words($phraseCol))")
        .cast("long").as("__len"))
    dt.join(broadcast(qt), "__w")
      .groupBy(col("q_id"), col("__doc"),
        (col("__doc_pos") - col("q_id_pos")).cast("long").as("anchor"))
      .agg(count(lit(1)).as("votes"))
      .where(col("anchor") >= 0)
      .join(broadcast(qlen), "q_id")
      .where(col("votes") === col("__len"))
      .groupBy(col("q_id"), col("__doc").as(idCol))
      .agg(count(lit(1)).as("n_hits"), min(col("anchor")).as("first_pos"))
  }
}
