package graft.meta

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Validated dataset IO — the reference's read/validate/merge discipline:
  *
  *  - `read`: open + gatekeep (schema fields present, stored metadata hash
  *    matches the recomputed one, preprocess-config hash matches the
  *    expected one) and optionally null-mask the estimate where
  *    status != 1 (/root/reference/xcorr/io/read.py:32-92,
  *    /root/reference/xcorr/io/validate.py:35-219).
  *  - `merge`: N datasets → one, outer alignment on the dimension key
  *    columns with duplicate collapse (xr.combine_by_coords semantics,
  *    /root/reference/xcorr/core/merge.py:21-89,
  *    /root/reference/xcorr/io/read.py:95-203 mfread).
  */
object TableIO {

  final case class ValidationError(msg: String) extends RuntimeException(msg)

  /** Read a table dir written with TableFormat properties and validate it.
    *
    * @param requiredColumns schema gate (validate.py:124-130 mandates the
    *                        dim coords)
    * @param expectedConfigHash reject data produced under a different
    *                           preprocess config (validate.py:185-194)
    * @param maskStatus null the `cc` column where status != 1
    *                   (read.py:90 `extract` semantics)
    */
  def read(
      spark: SparkSession,
      dir: String,
      requiredColumns: Seq[String],
      expectedConfigHash: Option[String] = None,
      maskStatus: Boolean = false
  ): DataFrame = {
    val props = TableFormat.readProps(dir)
    // metadata self-validation (validate.py:136-159): recompute the hash of
    // everything but the hash keys and compare
    props.get("sha256_hash_metadata").foreach { stored =>
      val recomputed = Hasher.hashObj(props)
      if (recomputed != stored)
        throw ValidationError(s"metadata hash mismatch: stored=$stored recomputed=$recomputed")
    }
    expectedConfigHash.foreach { want =>
      val got = props.getOrElse("job_config_sha256", "")
      if (got != want)
        throw ValidationError(s"preprocess/config hash mismatch: stored=$got expected=$want")
    }
    val df = spark.read.parquet(s"$dir/data")
    val missing = requiredColumns.filterNot(df.columns.contains)
    if (missing.nonEmpty)
      throw ValidationError(s"missing required columns: ${missing.mkString(", ")}")
    if (maskStatus && df.columns.contains("cc") && df.columns.contains("status"))
      df.withColumn("cc", when(col("status") === 1, col("cc")))
    else df
  }

  /** Validate a list of table dirs: the head eagerly, the rest in parallel
    * against the HEAD's config hash (the reference's validate_list shape —
    * /root/reference/xcorr/io/validate.py:222-369: first file is the
    * reference copy, the tail validates concurrently against its hashes).
    * Returns the validated frames in input order, ready for [[merge]].
    */
  def validateList(
      spark: SparkSession,
      dirs: Seq[String],
      requiredColumns: Seq[String],
      maskStatus: Boolean = false,
      timeoutSec: Long = 600
  ): Seq[DataFrame] = {
    require(dirs.nonEmpty, "validateList needs at least one table dir")
    val head = read(spark, dirs.head, requiredColumns, None, maskStatus)
    val headHash = TableFormat.readProps(dirs.head).get("job_config_sha256")
    import scala.concurrent.{Await, Future, TimeoutException}
    import scala.concurrent.ExecutionContext.Implicits.global
    import scala.concurrent.duration._
    // per-dir futures (not one traverse) so a hung filesystem read times
    // out with the OFFENDING table dir named, instead of blocking the
    // caller forever
    val rest = dirs.tail.toList.map(d =>
      d -> Future(read(spark, d, requiredColumns, headHash, maskStatus)))
    // Per-dir budget, not one shared deadline: with a shared deadline one
    // slow-but-healthy early dir eats the budget and spuriously times out
    // the rest. The futures START concurrently, so when every dir is
    // healthy the total wall clock is ~timeoutSec + max(read time); the
    // WORST case is ~n*timeoutSec (each dir completing just under its
    // cumulative position in the await chain, or futures queueing behind a
    // saturated ExecutionContext), the price of guaranteeing every dir its
    // full budget of running time.
    // Caveat (JVM futures are not cancelable): a timed-out read keeps
    // running detached on the global ExecutionContext until its filesystem
    // call returns — the ValidationError names the offender so the caller
    // can act, but the thread itself is only reclaimed when the read
    // completes or the session dies.
    head +: rest.map { case (d, f) =>
      try Await.result(f, timeoutSec.seconds)
      catch {
        case _: TimeoutException =>
          throw ValidationError(s"validateList timed out after ${timeoutSec}s waiting on $d")
      }
    }
  }

  /** Outer-align N frames on `dimKeys`, collapsing duplicate cells
    * (merge.py's combine_by_coords with data_vars='minimal'). When a
    * `status` column is present the HIGHEST status wins per key (a
    * retry-upgraded cell from one table must not be shadowed by another
    * table's stale -1 row — same freshest-wins rule as ProcessJob.readCc);
    * equal-status duplicates are bit-identical deterministic recomputes,
    * so any of them is exact.
    */
  def merge(frames: Seq[DataFrame], dimKeys: Seq[String]): DataFrame = {
    require(frames.nonEmpty)
    val u = frames.reduce(_.unionByName(_, allowMissingColumns = true))
    if (u.columns.contains("status")) {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(dimKeys.map(col): _*).orderBy(col("status").desc)
      u.withColumn("__rn", org.apache.spark.sql.functions.row_number().over(w))
        .where(col("__rn") === 1).drop("__rn")
    } else u.dropDuplicates(dimKeys)
  }
}
