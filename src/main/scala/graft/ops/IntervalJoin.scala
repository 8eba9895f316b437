package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Interval-overlap join with an equality key: all (left, right) pairs
  * sharing `keyCol` whose half-open time intervals [start, end) intersect
  * — the temporal-correlation primitive (Flink's interval join, genomics'
  * range join) that a naive formulation turns into a broadcast-nested-loop
  * over the range predicate.
  *
  * Scale shape: both sides explode each interval to the coarse time
  * buckets it covers, the join runs as a plain HASH equi-join on
  * (key, bucket), and the exact overlap predicate filters the bucket-local
  * candidates. A pair overlapping across several shared buckets would
  * duplicate, so each candidate is kept ONLY in the bucket containing the
  * overlap's start (`bucket == floor(max(l_start, r_start) / bucketSec)`)
  * — dedup by arithmetic, not by a distinct shuffle. Shuffle volume is
  * rows x ceil(interval/bucket), so pick bucketSec near the typical
  * interval length; skewed keys fall out of the (key, bucket) composite
  * automatically as long as intervals are shorter than the skew horizon.
  *
  * Contract: left carries (keyCol, l_id, l_start, l_end), right carries
  * (keyCol, r_id, r_start, r_end); timestamps, end exclusive, end > start
  * (degenerate intervals are dropped — they contain no time point).
  * Output: keyCol, l_id, r_id, overlap_us (microseconds of intersection,
  * always > 0).
  */
object IntervalJoin {

  def overlap(left: DataFrame, right: DataFrame, keyCol: String,
      bucketSec: Long): DataFrame = {
    require(bucketSec > 0, s"bucketSec must be positive, got $bucketSec")
    val bUs = bucketSec * 1000000L
    def buckets(df: DataFrame, s: String, e: String): DataFrame =
      df.where(col(s) < col(e))
        .withColumn("__bucket",
          explode(sequence(
            expr(s"unix_micros(cast($s as timestamp)) div $bUs"),
            expr(s"(unix_micros(cast($e as timestamp)) - 1) div $bUs"))))
    val lb = buckets(left, "l_start", "l_end")
    val rb = buckets(right, "r_start", "r_end")
    lb.join(rb, Seq(keyCol, "__bucket"))
      .where(col("l_start") < col("r_end") && col("r_start") < col("l_end"))
      // keep exactly the candidate from the overlap's FIRST shared bucket
      .where(col("__bucket") ===
        expr(s"unix_micros(cast(greatest(l_start, r_start) as timestamp)) div $bUs"))
      .select(
        col(keyCol), col("l_id"), col("r_id"),
        (expr("unix_micros(cast(least(l_end, r_end) as timestamp))") -
          expr("unix_micros(cast(greatest(l_start, r_start) as timestamp))")).as("overlap_us"))
  }
}
