package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** The last mile between a curated corpus and the trainer: PII
  * redaction, fixed-token-budget sequence packing, and sliding-window
  * chunking. These are the stages a pretraining pipeline runs AFTER
  * quality/dedup/decontamination ([[Curation]]) to turn kept documents
  * into model-ready sequences.
  *
  * Hash-gate discipline (the rules from [[graft.Queries]]): every
  * decision here is string/integer-domain — regex redaction, md5 shard
  * buckets, integer cumulative sums and divisions — so all three
  * operators replay exactly in any engine, no float tolerance anywhere.
  *
  * Reference analog: the preprocess registry transforms each series
  * in place before the expensive CC stage
  * (/root/reference/xcorr/core/process.py:42-85); this is the text
  * counterpart transforming each kept document before training.
  */
object TrainPrep {

  /** PII patterns, applied in this order (each category is counted on
    * the text AS IT STANDS when that category is scrubbed, so the three
    * passes compose deterministically; replacement tokens contain no
    * digits, so a later pattern can never match inside an earlier
    * redaction). Patterns are deliberately restricted to character
    * classes, bounded quantifiers, `\b` and top-level alternation — the
    * subset with identical semantics in Java regex and RE2 (no
    * lookaround, no backreferences), so the DuckDB oracle replays the
    * scrub byte-for-byte.
    */
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val PhoneRe = "(\\+[0-9]{7,15}|\\b[0-9]{3}-[0-9]{3}-[0-9]{4}\\b)"
  val IpRe    = "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b"

  /** Redact emails, phone numbers (international `+digits` and NNN-NNN-
    * NNNN forms) and IPv4 literals from `textCol`. Output: all input
    * columns + `n_emails`, `n_phones`, `n_ips` (count of redactions per
    * category) + `clean` (the scrubbed text). NULL text passes through
    * as NULL counts and NULL clean.
    *
    * Scale shape: a pure per-row map — zero shuffle, pipelines into the
    * scan; the regexes are codegen'd `RLIKE`-family expressions, no UDF.
    */
  def scrubPii(df: DataFrame, textCol: String): DataFrame = {
    val t0 = col(textCol)
    val t1 = regexp_replace(t0, EmailRe, "<EMAIL>")
    val t2 = regexp_replace(t1, PhoneRe, "<PHONE>")
    val t3 = regexp_replace(t2, IpRe, "<IP>")
    df.withColumn("n_emails", regexp_count(t0, lit(EmailRe)))
      .withColumn("n_phones", regexp_count(t1, lit(PhoneRe)))
      .withColumn("n_ips", regexp_count(t2, lit(IpRe)))
      .withColumn("clean", t3)
  }

  /** Greedy-concatenation sequence packing: documents are laid head-to-
    * tail in (shard, doc id) order and the token stream is cut every
    * `budget` tokens — the GPT-style packing rule where a document may
    * straddle a sequence boundary. Output per doc: `shard`, `n_tok`
    * (whitespace tokens, the q32 definition), `tok_offset` (tokens
    * before this doc within its shard), `first_seq`/`last_seq` (the
    * shard-local sequence ids this doc lands in) and `n_seqs` spanned.
    * Docs with NULL text are dropped (no tokens to pack).
    *
    * Determinism/stability: the shard is [[Sampling.bucketCol]] mod
    * `nShards` (content-stable md5 arithmetic) and the intra-shard order
    * is the doc id, so a doc's placement depends only on the docs in its
    * own shard — append-only corpora extend shards at the tail.
    *
    * Scale shape: ONE shuffle on the shard key; each shard's cumulative
    * sum is a single window sort, so `nShards` is the parallelism knob
    * (pick ≥ cluster cores; 100 TB ⇒ O(10⁴) shards of a few GB). No
    * global order-by, no single-partition stage.
    */
  def pack(
      df: DataFrame,
      idCol: String,
      textCol: String,
      budget: Int,
      nShards: Int): DataFrame = {
    require(budget >= 1, s"budget must be >= 1, got $budget")
    require(nShards >= 1 && nShards <= 256,
      s"nShards must be in [1, 256] (shard = md5 bucket mod nShards), got $nShards")
    val w = Window.partitionBy(col("shard")).orderBy(col(idCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    df.select(col(idCol), col(textCol))
      .withColumn("shard", Sampling.bucketCol(idCol) % nShards)
      .withColumn("n_tok", size(Dedup.tokens(col(textCol))).cast("long"))
      .where(col("n_tok") >= 1) // NULL text -> size() is NULL -> dropped
      .withColumn("tok_offset", coalesce(sum(col("n_tok")).over(w), lit(0L)))
      .select(col(idCol), col("shard"), col("n_tok"), col("tok_offset"),
        expr(s"tok_offset DIV $budget").as("first_seq"),
        expr(s"(tok_offset + n_tok - 1) DIV $budget").as("last_seq"))
      .withColumn("n_seqs", col("last_seq") - col("first_seq") + 1L)
  }

  /** Sliding-window chunking: one row per (doc, window) with the window
    * text rebuilt from the token array — the retrieval/long-context
    * counterpart of [[pack]] (overlapping windows instead of a packed
    * stream). Windows start at 0, stride, 2·stride, … while start <
    * n_tok; the final windows are partial (`tok_len` = min(size,
    * n_tok − start)), so every token is covered and a doc shorter than
    * one window still yields its single partial chunk. Output: `idCol`,
    * `chunk_idx`, `tok_start`, `tok_len`, `chunk_text` (tokens joined by
    * one space — canonical whitespace, like [[TextQuality.dedupLines]]'
    * rebuilt text). NULL-text docs yield no rows.
    *
    * Scale shape: per-row explode, zero shuffle; output rows ≈
    * n_tok/stride per doc, each chunk O(size) tokens.
    */
  def chunk(
      df: DataFrame,
      idCol: String,
      textCol: String,
      chunkSize: Int,
      stride: Int): DataFrame = {
    require(chunkSize >= 1, s"chunkSize must be >= 1, got $chunkSize")
    require(stride >= 1 && stride <= chunkSize,
      s"stride must be in [1, chunkSize] (gaps would skip tokens), got $stride")
    val toks = df
      .select(col(idCol), Dedup.tokens(col(textCol)).as("__toks"))
      .withColumn("__n", size(col("__toks")).cast("long"))
      .where(col("__n") >= 1)
    toks
      .select(col(idCol), col("__toks"), col("__n"),
        explode(sequence(lit(0L), col("__n") - 1L, lit(stride.toLong))).as("tok_start"))
      .select(col(idCol),
        expr(s"tok_start DIV $stride").as("chunk_idx"),
        col("tok_start"),
        least(lit(chunkSize.toLong), col("__n") - col("tok_start")).as("tok_len"),
        array_join(slice(col("__toks"), (col("tok_start") + 1L).cast("int"),
          least(lit(chunkSize), (col("__n") - col("tok_start")).cast("int"))), " ").as("chunk_text"))
  }
}
