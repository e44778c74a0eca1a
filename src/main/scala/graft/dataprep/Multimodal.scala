package graft.dataprep

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing (task brief): media payloads are opaque
  * `binary` columns with typed metadata travelling beside them. The
  * actual codec step is STUBBED — this container has no image/audio
  * libraries — with a deterministic fake, but everything Spark-side is
  * real and tested: schema, batch shape, partition-parallel decode,
  * metadata extraction as codegen'd column algebra.
  */
object Multimodal {

  /** Attach a synthetic binary payload to each document (stands in for
    * the bytes an `image`/`audio` column would carry). */
  def withPayload(documents: DataFrame): DataFrame =
    documents.select(
      col("doc_id"),
      encode(col("text"), "UTF-8").as("payload"),
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (col("doc_id") % 3 + 1).cast("int")).as("media_kind"))

  /** Metadata extraction over the binary column — pure column algebra
    * (no decode): byte length, content hash, plus deterministic fake
    * decode outputs (width/height/frames) in place of the real codec. */
  def metadata(documents: DataFrame): DataFrame =
    withPayload(documents).select(
      col("doc_id"), col("media_kind"),
      length(col("payload")).cast("long").as("n_bytes"),
      md5(col("payload")).as("content_hash"),
      (lit(64) + pmod(length(col("payload")), lit(512))).cast("int").as("fake_width"),
      (lit(64) + pmod(length(col("payload")) * 7, lit(512))).cast("int").as("fake_height"),
      (lit(1) + col("doc_id") % 24).cast("int").as("fake_frames"))

  final case class MediaRow(doc_id: Long, payload: Array[Byte], media_kind: String)
  final case class DecodedRow(doc_id: Long, media_kind: String,
                              n_bytes: Int, feature: Array[Float])

  /** Partition-parallel "decode": the Scala analogue of a batched
    * `mapInPandas` decode UDF. The codec call is the clearly-marked stub
    * below; the batching shape (one iterator per partition, streaming,
    * no per-row session/codec setup) is the real pattern a libvips/ffmpeg
    * decode would use at scale. */
  def decodeStub(media: Dataset[MediaRow]): Dataset[DecodedRow] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      // >>> STUB: a real implementation opens the codec ONCE here <<<
      it.map { r =>
        // >>> STUB: fake feature vector derived from the bytes; a real
        // implementation would decode r.payload and extract features <<<
        val f = new Array[Float](4)
        var i = 0
        while (i < r.payload.length) {
          f(i % 4) += (r.payload(i) & 0xFF) / 255.0f
          i += 1
        }
        DecodedRow(r.doc_id, r.media_kind, r.payload.length, f)
      }
    }
  }
}
