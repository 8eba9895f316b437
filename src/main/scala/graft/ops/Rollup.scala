package graft.ops

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import graft.codec.{ChunkBlob, Lttb}

/** Continuous-aggregate rollup cascade with retention tiers (engine-new;
  * the reference's storage analog is the zlib-9 netCDF chunk,
  * /root/reference/xcorr/core/init.py:121). Stats are
  * {n, sum, min, max, first, last} chosen so tiers compose EXACTLY:
  * 1h = fold(1m rows), 1d = fold(1h rows) — the BASELINE.md exact-match
  * gate. `first`/`last` use min_by/max_by on the (unique per key) grid ts,
  * so results are partitioning-invariant; sums are integral-valued doubles
  * (see Ingest) and therefore order-independent.
  *
  * All aggregations are plain `groupBy().agg()` — Spark's partial/final
  * (map-side combine) aggregation handles skewed hot conv_ids without an
  * explicit salt; the shuffle key (conv_id, metric, chunk) has per-key
  * cardinality bounded by the tier ratio (60 / 24), so no single reducer
  * key can exceed that bound regardless of how hot a conversation is.
  */
object Rollup {

  private val statCols = Seq("n", "sum", "min", "max", "first", "last")

  /** Tier-1: fold grid points into `unit`-aligned chunks
    * (unit ∈ minute/hour/day — SQL date_trunc levels).
    */
  def fromPoints(points: DataFrame, unit: String): DataFrame =
    points
      .groupBy(col("conv_id"), col("metric"), date_trunc(unit, col("ts")).as("chunk_start"))
      .agg(
        count(lit(1)).as("n"),
        sum(col("value")).as("sum"),
        min(col("value")).as("min"),
        max(col("value")).as("max"),
        min_by(col("value"), col("ts")).as("first"),
        max_by(col("value"), col("ts")).as("last")
      )

  /** Higher tier from a lower tier — the hierarchical re-aggregation
    * (SURVEY.md §2.6 "Aggregations"): stats compose exactly.
    */
  def fromLower(lower: DataFrame, unit: String): DataFrame =
    lower
      .groupBy(col("conv_id"), col("metric"), date_trunc(unit, col("chunk_start")).as("chunk_start"))
      .agg(
        sum(col("n")).as("n"),
        sum(col("sum")).as("sum"),
        min(col("min")).as("min"),
        max(col("max")).as("max"),
        min_by(col("first"), col("chunk_start")).as("first"),
        max_by(col("last"), col("chunk_start")).as("last")
      )

  /** The full 1m → 1h → 1d cascade from tier-0 grid points. */
  def cascade(points: DataFrame): (DataFrame, DataFrame, DataFrame) = {
    val m1 = fromPoints(points, "minute")
    val h1 = fromLower(m1, "hour")
    val d1 = fromLower(h1, "day")
    (m1, h1, d1)
  }

  /** Timestamps are stored in the blob at MICROsecond precision (the
    * parquet/Spark timestamp resolution) so decode(encode(x)) == x exactly.
    */
  private def tsToMicros(t: java.sql.Timestamp): Long =
    t.getTime / 1000 * 1000000L + t.getNanos / 1000

  private def microsToTs(us: Long): java.sql.Timestamp = {
    val t = new java.sql.Timestamp(Math.floorDiv(us, 1000000L) * 1000L)
    t.setNanos((Math.floorMod(us, 1000000L) * 1000L).toInt)
    t
  }

  private val encodeChunk = udf { (pts: Seq[Row]) =>
    // pts sorted by ts (array_sort on struct sorts by first field)
    val ts = pts.map(r => tsToMicros(r.getTimestamp(0))).toArray
    val vs = pts.map(_.getDouble(1)).toArray
    ChunkBlob.encode(ts, vs)
  }

  private val decodeChunk = udf { (blob: Array[Byte]) =>
    val (ts, vs) = ChunkBlob.decode(blob)
    ts.indices.map(i => (microsToTs(ts(i)), vs(i)))
  }

  /** Chunked storage form: per (conv, metric, `unit` chunk) the raw grid
    * points delta-of-delta + Gorilla compressed into one binary blob
    * (Gorilla §4.1, public algorithm — see graft.codec).
    */
  def toChunks(points: DataFrame, unit: String): DataFrame =
    points
      .groupBy(col("conv_id"), col("metric"), date_trunc(unit, col("ts")).as("chunk_start"))
      .agg(array_sort(collect_list(struct(col("ts").cast("timestamp").as("ts"), col("value")))).as("pts"))
      .select(
        col("conv_id"), col("metric"), col("chunk_start"),
        size(col("pts")).as("n_points"),
        encodeChunk(col("pts")).as("chunk_blob")
      )

  /** Explode chunk blobs back into (conv_id, metric, ts, value) points. */
  def fromChunks(chunks: DataFrame): DataFrame =
    chunks
      .select(
        col("conv_id"), col("metric"),
        explode(decodeChunk(col("chunk_blob"))).as("pt")
      )
      .select(col("conv_id"), col("metric"), col("pt._1").as("ts"), col("pt._2").as("value"))

  private val lttbUdf = udf { (pts: Seq[Row], threshold: Int) =>
    val ts = pts.map(r => tsToMicros(r.getTimestamp(0))).toArray
    val vs = pts.map(_.getDouble(1)).toArray
    val (dt, dv) = Lttb.downsample(ts, vs, threshold)
    dt.indices.map(i => (microsToTs(dt(i)), dv(i)))
  }

  /** LTTB visualization tier: at most `threshold` points per (conv, metric),
    * computed hierarchically so no aggregation buffer ever holds a key's
    * full history:
    *
    *  stage 1 — LTTB per (conv, metric, `chunkUnit` chunk) down to at most
    *            `threshold` keepers (buffer ≤ points-per-chunk: bounded by
    *            the chunk duration over the grid step, not by key history);
    *  stage 2 — LTTB the concatenated keepers down to `threshold`
    *            (buffer ≤ n_chunks · threshold).
    *
    * LTTB keeps first/last per input, so chunk boundaries survive into
    * stage 2 and the global first/last are exact. The keeper count per key
    * equals the single-pass count (min(threshold, n_points)); the selected
    * interior points are the hierarchical approximation standard for
    * streaming LTTB.
    */
  def lttbTier(points: DataFrame, threshold: Int, chunkUnit: String = "day"): DataFrame = {
    val stage1 = points
      .groupBy(col("conv_id"), col("metric"), date_trunc(chunkUnit, col("ts")).as("chunk"))
      .agg(array_sort(collect_list(struct(col("ts").cast("timestamp").as("ts"), col("value")))).as("pts"))
      .select(col("conv_id"), col("metric"), explode(lttbUdf(col("pts"), lit(threshold))).as("pt"))
      .select(col("conv_id"), col("metric"), col("pt._1").as("ts"), col("pt._2").as("value"))
    stage1
      .groupBy(col("conv_id"), col("metric"))
      .agg(array_sort(collect_list(struct(col("ts").cast("timestamp").as("ts"), col("value")))).as("pts"))
      .select(col("conv_id"), col("metric"), explode(lttbUdf(col("pts"), lit(threshold))).as("pt"))
      .select(col("conv_id"), col("metric"), col("pt._1").as("ts"), col("pt._2").as("value"))
  }
}
