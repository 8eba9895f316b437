package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.{Multimodal, Similarity}

class MultimodalSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("media synthesis is deterministic and schema-conformant") {
    spark.sparkContext.setLogLevel("WARN")
    val a = Multimodal.synthesize(spark, 30).orderBy("asset_id").collect()
    val b = Multimodal.synthesize(spark, 30).repartition(7).orderBy("asset_id").collect()
    assert(a.length == 30)
    a.zip(b).foreach { case (x, y) =>
      assert(x.getLong(0) == y.getLong(0))
      assert(x.getAs[Array[Byte]]("bytes").sameElements(y.getAs[Array[Byte]]("bytes")))
    }
  }

  test("feature extraction: stub decode produces normalized 16-bin histograms") {
    val media = Multimodal.synthesize(spark, 20)
    val feats = Multimodal.extractFeatures(media).collect()
    assert(feats.length == 20)
    feats.foreach { r =>
      val f = r.getSeq[Float](r.fieldIndex("features"))
      assert(f.length == 16)
      assert(math.abs(f.sum - 1.0f) < 1e-4)
    }
  }

  test("frame sampling explodes every-kth frame for videos only") {
    val media = Multimodal.synthesize(spark, 30)
    val frames = Multimodal.sampleFrames(media, everyK = 4)
    val joined = frames.join(media, "asset_id")
    assert(joined.where(col("kind") =!= "video").count() == 0)
    // each asset's frame count == ceil(n_frames / 4)
    val bad = joined.groupBy(col("asset_id"), col("n_frames")).count()
      .where(col("count") =!= ceil(col("n_frames") / 4.0).cast("long"))
    assert(bad.count() == 0)
  }

  test("similarity ops: exact top-k matches brute-force local computation") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val topk = Similarity.cosineTopK(emb, Seq(0L, 1L), 3).collect()
    assert(topk.length == 6)
    // local oracle for query 0
    val local = emb.select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getAs[Seq[Float]](1).map(_.toDouble).toArray).toMap
    def cos(a: Array[Double], b: Array[Double]) = {
      val d = a.indices.map(i => a(i) * b(i)).sum
      d / (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))
    }
    val q0 = local(0L)
    val want = local.filter(_._1 != 0L).map { case (id, v) => (id, cos(q0, v)) }
      .toSeq.sortBy { case (id, c) => (-c, id) }.take(3).map(_._1)
    val got = topk.filter(_.getLong(0) == 0L).sortBy(_.getInt(3)).map(_.getLong(1)).toSeq
    assert(got == want, s"$got vs $want")
  }

  test("lsh buckets: hamming-similar vectors share buckets more than random") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val buckets = Similarity.lshBuckets(emb).collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(buckets.size == 500 && buckets.values.forall(_.length == 8))
    val cands = Similarity.lshCandidates(emb)
    // every candidate pair genuinely shares its bucket
    val c = cands.collect()
    c.foreach(r => assert(buckets(r.getLong(0)) == buckets(r.getLong(1))))
  }
}
