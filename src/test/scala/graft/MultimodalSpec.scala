package graft

import graft.ext.Multimodal
import org.apache.spark.sql.functions._

/** Multimodal plumbing: schema, deterministic stub decode, partition-
  * parallel extraction (SURVEY §7.5 — decode is a documented stub; the
  * Spark-side plumbing is the deliverable).
  */
class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Seq(
    (0L, "x" * 100), (1L, "y" * 50), (2L, "z" * 300), (3L, "")
  ).toDF("doc_id", "text")

  test("asMedia produces binary payloads with typed media_type") {
    val m = Multimodal.asMedia(docs)
    assert(m.schema("media").dataType.typeName == "binary")
    val types = m.select($"doc_id", $"media_type").as[(Long, String)]
      .collect().toMap
    assert(types(0L) == "image" && types(1L) == "audio" &&
      types(2L) == "video")
  }

  test("extractFeatures: deterministic stub dims, n_bytes exact") {
    val f = Multimodal.extractFeatures(Multimodal.asMedia(docs))
    val rows = f.collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(rows(0L).getAs[Long]("n_bytes") == 100)
    assert(rows(0L).getAs[Int]("width") == 10)   // √100
    assert(rows(0L).getAs[Int]("height") == 10)
    assert(rows(3L).getAs[Long]("n_bytes") == 0)
    assert(rows(3L).getAs[Int]("width") == 1)    // degenerate guard
    // mean intensity of 'x'*100 is exactly 'x'.toByte
    assert(rows(0L).getAs[Double]("mean_intensity") == 'x'.toInt.toDouble)
  }

  test("video items sample frames, others exactly 1") {
    val f = Multimodal.extractFeatures(Multimodal.asMedia(docs))
    val frames = f.collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Int]("frames_sampled"))
      .toMap
    assert(frames(0L) == 1 && frames(1L) == 1)
    assert(frames(2L) >= 1) // video path
  }
}
