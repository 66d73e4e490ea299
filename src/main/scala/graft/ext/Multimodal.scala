package graft.ext

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing (SURVEY §2.12 X5): image/audio/video payloads
  * as opaque BinaryType columns with typed metadata, processed per-partition
  * in batches — the Scala analogue of a `mapInPandas` decode stage.
  *
  * The DECODE ITSELF IS A STUB: no image/audio codecs ship in this
  * environment, so [[decodeStub]] derives deterministic pseudo-features from
  * the payload bytes. Everything around it — the binary schema, the
  * per-partition batching, the typed output encoders, the frame-sampling
  * fan-out, the fixed-width embedding contract — is the real Spark-side
  * structure a production decoder (JNI/FFM codec, ONNX runtime, ...) would
  * drop into: replace the marked function body, keep the operator.
  *
  * Scale notes: decode is per-row CPU work with no shuffle — it scales
  * linearly with executors; frame sampling multiplies rows by nFrames
  * BEFORE any shuffle, so downstream aggregations see the exploded
  * cardinality; payloads stay byte arrays end to end (no string round-trip).
  */
object Multimodal {

  final case class MediaMeta(doc_id: Long, format: String, n_bytes: Int,
      width: Int, height: Int)
  final case class MediaFrame(doc_id: Long, frame_idx: Int, frame_hash: Long)
  final case class MediaEmbedding(doc_id: Long, embedding: Array[Float])

  /** >>> STUB DECODE <<< deterministic pseudo-decode of a binary payload.
    * A real implementation would parse the container header here. */
  private[ext] def fakeDecode(id: Long, bytes: Array[Byte]): MediaMeta = {
    val n = if (bytes == null) 0 else bytes.length
    // deterministic pseudo-header fields from payload bytes
    var h = 1125899906842597L
    var i = 0
    while (i < math.min(n, 64)) { h = 31 * h + bytes(i); i += 1 }
    val fmt = (math.floorMod(h, 3) match {
      case 0 => "png"
      case 1 => "jpeg"
      case _ => "webp"
    })
    MediaMeta(id, fmt, n,
      width = 16 + math.floorMod(h >> 8, 1024).toInt,
      height = 16 + math.floorMod(h >> 20, 1024).toInt)
  }

  /** Decode a (doc_id, payload: binary) frame into typed media metadata.
    * mapPartitions: one decoder context per partition (real codecs are
    * expensive to construct — amortize across the batch, never per row). */
  def decodeStub(df: DataFrame): Dataset[MediaMeta] = {
    import df.sparkSession.implicits._
    df.select(col("doc_id").cast("long"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        // >>> real codec init would happen once HERE <<<
        it.map { case (id, bytes) => fakeDecode(id, bytes) }
      }
  }

  /** Sample nFrames pseudo-frames per payload (video frame-sampling shape:
    * one input row fans out to nFrames rows, computed partition-locally). */
  def sampleFrames(df: DataFrame, nFrames: Int): Dataset[MediaFrame] = {
    import df.sparkSession.implicits._
    df.select(col("doc_id").cast("long"), col("payload"))
      .as[(Long, Array[Byte])]
      .flatMap { case (id, bytes) =>
        val n = if (bytes == null) 0 else bytes.length
        (0 until nFrames).iterator.map { f =>
          val off = if (n == 0) 0 else (f.toLong * n) / nFrames
          var h = 1125899906842597L
          var i = off.toInt
          while (i < math.min(n, off.toInt + 32)) { h = 31 * h + bytes(i); i += 1 }
          MediaFrame(id, f, h)
        }
      }
  }

  /** Fixed-width pseudo-embedding per payload (the mapInPandas-batch shape of
    * an encoder model; STUB body, real contract: dim floats per row). */
  def embedStub(df: DataFrame, dim: Int = 16): Dataset[MediaEmbedding] = {
    import df.sparkSession.implicits._
    df.select(col("doc_id").cast("long"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, bytes) =>
          val n = if (bytes == null) 0 else bytes.length
          val v = new Array[Float](dim)
          var i = 0
          while (i < n) { v(i % dim) += (bytes(i) & 0xFF) / 255.0f; i += 1 }
          MediaEmbedding(id, v)
        }
      }
  }
}
