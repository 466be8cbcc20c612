package graft

import org.apache.spark.sql.{Encoders, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.core.Sessions
import graft.multimodal._

/** Multimodal plumbing: schema, per-partition decode, determinism,
  * metadata-only transforms.
  */
class MultimodalSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark: SparkSession =
    Sessions.tune(SparkSession.builder().master("local[4]"), 4).getOrCreate()
  import spark.implicits._

  override def afterAll(): Unit = spark.stop()

  private def docs = Seq(
    (0L, "hello world", 11L),
    (1L, "abc", 3L),
    (2L, "a video doc with frames", 23L),
    (5L, "another video here", 18L))
    .toDF("doc_id", "text", "n_chars")

  test("media table schema: binary payload + typed metadata") {
    val m = Multimodal.mediaFromDocuments(docs)
    assert(m.schema("bytes").dataType.typeName == "binary")
    val row = m.where(col("media_id") === 0).select("kind", "meta.width").head()
    assert(row.getString(0) == "image") // 0 % 3
    // width = 64 + (11 % 64) * 8 = 152
    assert(row.getInt(1) == 152)
  }

  test("feature extraction is deterministic and batched per partition") {
    val media = Multimodal.mediaFromDocuments(docs)
      .as[MediaRecord](Encoders.product[MediaRecord])
    val f1 = Multimodal.extractFeatures(media, 8).collect()
      .map(f => f.media_id -> f.features.toSeq).toMap
    val f2 = Multimodal.extractFeatures(media.repartition(3), 8).collect()
      .map(f => f.media_id -> f.features.toSeq).toMap
    assert(f1 == f2) // partitioning must not change decode output
    assert(f1(0L).size == 8 && f1.values.flatten.forall(v => v >= 0 && v < 1))
  }

  test("frame sampling: one row per everyMs, videos only") {
    val m = Multimodal.mediaFromDocuments(docs)
    val frames = Multimodal.sampleFrames(m, 100L)
      .select("media_id", "frame_idx", "frame_ts_ms")
      .as[(Long, Int, Long)].collect().groupBy(_._1)
    // videos are doc_id % 3 == 2: ids 2 and 5
    assert(frames.keySet == Set(2L, 5L))
    // id 2: duration 23*20=460ms -> frames at 0,100,...,400 = 5 frames
    assert(frames(2L).map(_._2).sorted.toSeq == (0 until 5))
    assert(frames(2L).map(_._3).max == 400L)
  }

  test("resize plan touches only metadata") {
    val m = Multimodal.mediaFromDocuments(docs)
    val r = Multimodal.resizePlan(m, 224, 224)
    assert(r.select("meta.width", "meta.height").distinct().head() ==
      org.apache.spark.sql.Row(224, 224))
    // payload untouched
    assert(r.select(length(col("bytes"))).as[Int].collect().sorted.toSeq ==
      m.select(length(col("bytes"))).as[Int].collect().sorted.toSeq)
  }
}
