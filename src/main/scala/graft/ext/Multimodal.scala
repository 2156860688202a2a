package graft.ext

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing for a training-data pipeline: media
  * (image/audio/video) as opaque BINARY columns with typed metadata,
  * processed batch-at-a-time inside `mapPartitions`.
  *
  * The container has no image/audio codecs (by design), so the DECODE STEP
  * IS A DETERMINISTIC STUB — `decodeStub` below fabricates "pixels" from
  * the bytes. Everything around it is the real engineering: schema
  * (binary + metadata struct), partition-parallel batched processing,
  * bounded memory per batch, and a typed output schema. Swapping
  * `decodeStub` for a real codec changes no plumbing.
  */
object Multimodal {

  final case class MediaItem(doc_id: Long, media: Array[Byte],
                             media_type: String)
  final case class MediaFeatures(doc_id: Long, n_bytes: Long, width: Int,
                                 height: Int, mean_intensity: Double,
                                 frames_sampled: Int)

  /** documents → opaque media column. Real pipelines read binary from
    * parquet/lance; here the bytes are the utf-8 text (an opaque payload
    * as far as the pipeline is concerned).
    */
  def asMedia(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
      encode(col("text"), "utf-8").as("media"),
      when(pmod(col("doc_id"), lit(3)) === 0, lit("image"))
        .when(pmod(col("doc_id"), lit(3)) === 1, lit("audio"))
        .otherwise(lit("video")).as("media_type"))

  /** STUB decode — stands in for an image/audio decoder that is not in
    * this container. Deterministic: derives fake dimensions from the byte
    * length and a fake intensity from the byte values, so tests are
    * stable. A real implementation would decode `bytes` here (one item at
    * a time, inside the partition loop — never collect).
    */
  def decodeStub(bytes: Array[Byte]): (Int, Int, Double) = {
    val n = bytes.length
    val width = math.max(1, math.sqrt(n.toDouble).toInt)
    val height = math.max(1, n / math.max(1, width))
    var s = 0L
    var i = 0
    while (i < n) { s += bytes(i) & 0xff; i += 1 }
    (width, height, if (n == 0) 0.0 else s.toDouble / n)
  }

  /** Feature extraction over media items: partition-parallel, streaming
    * per item, no driver involvement. Frame sampling for "video" = every
    * 64th byte-row of the fake decode (stub for real frame extraction).
    */
  def extractFeatures(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.as[MediaItem].mapPartitions { it =>
      it.map { item =>
        val (w, h, mean) = decodeStub(item.media)
        val frames = if (item.media_type == "video")
          math.max(1, h / 64) else 1
        MediaFeatures(item.doc_id, item.media.length.toLong, w, h, mean,
          frames)
      }
    }.toDF()
  }
}
