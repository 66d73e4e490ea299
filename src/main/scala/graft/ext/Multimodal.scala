package graft.ext

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing (SURVEY §2.12 X5): image/audio/video payloads
  * as opaque BinaryType columns with typed metadata, processed per-partition
  * in batches — the Scala analogue of a `mapInPandas` decode stage.
  *
  * What is REAL here (no codec library involved, pure byte-layout work
  * built up over rounds 3–6): container-header decode for PNG/GIF/BMP/
  * JPEG/WAV/AVI (magic sniffing + dimension/rate parsing), full PIXEL
  * decode for PNG (inflate + all five filter predictors) and BMP, SAMPLE
  * decode for PCM and IMA-ADPCM WAV, and uncompressed-AVI frame
  * extraction — these feed the x40/x64/x65/x110/x140/x142/x145 operators
  * with decoded pixels/samples/frames, not hashes of compressed bytes.
  * What REMAINS STUBBED: compressed-codec payloads (mp3/h264/vorbis — no
  * codec ships in this environment) and the learned-embedding step, where
  * [[decodeStub]] derives deterministic pseudo-features from payload
  * bytes. The surrounding structure — binary schema, per-partition
  * batching, typed output encoders, frame-sampling fan-out, fixed-width
  * embedding contract — is the production shape either way: a JNI/FFM
  * codec or ONNX runtime drops into the marked function bodies.
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

  // ------------------------------------------------------------------------
  // REAL container-header decode: magic-number sniffing and dimension
  // parsing are pure byte-layout work — no codec library needed. Only the
  // PIXEL/SAMPLE decode below this layer remains stubbed.
  // ------------------------------------------------------------------------

  private def be16(b: Array[Byte], i: Int): Int =
    ((b(i) & 0xff) << 8) | (b(i + 1) & 0xff)
  private def be32(b: Array[Byte], i: Int): Int =
    ((b(i) & 0xff) << 24) | ((b(i + 1) & 0xff) << 16) |
      ((b(i + 2) & 0xff) << 8) | (b(i + 3) & 0xff)
  private def le16(b: Array[Byte], i: Int): Int =
    (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8)
  private def le32(b: Array[Byte], i: Int): Int =
    (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8) |
      ((b(i + 2) & 0xff) << 16) | ((b(i + 3) & 0xff) << 24)

  /** REAL header decode: format + dimensions parsed from actual container
    * layouts (PNG IHDR, GIF logical screen, BMP info header, JPEG SOF
    * marker scan, WAV fmt chunk — width/height carry channels/sampleRate
    * for audio). Unknown containers → ("unknown", 0, 0); never throws. */
  def sniffMeta(id: Long, bytes: Array[Byte]): MediaMeta = {
    val b = if (bytes == null) Array.emptyByteArray else bytes
    def has(i: Int) = b.length >= i
    try {
      if (has(24) && (b(0) & 0xff) == 0x89 && b(1) == 'P' && b(2) == 'N' && b(3) == 'G')
        MediaMeta(id, "png", b.length, be32(b, 16), be32(b, 20))
      else if (has(10) && b(0) == 'G' && b(1) == 'I' && b(2) == 'F')
        MediaMeta(id, "gif", b.length, le16(b, 6), le16(b, 8))
      else if (has(26) && b(0) == 'B' && b(1) == 'M')
        MediaMeta(id, "bmp", b.length, le32(b, 18), le32(b, 22))
      else if (has(3) && (b(0) & 0xff) == 0xff && (b(1) & 0xff) == 0xd8 &&
          (b(2) & 0xff) == 0xff) {
        // JPEG: walk marker segments to the first SOFn (C0–CF minus C4/C8/CC)
        var i = 2
        var w = 0; var h = 0
        while (i + 3 < b.length && w == 0) {
          if ((b(i) & 0xff) == 0xff) {
            val m = b(i + 1) & 0xff
            if (m == 0xff) i += 1 // fill/padding byte before the marker code
            else if (m >= 0xc0 && m <= 0xcf && m != 0xc4 && m != 0xc8 && m != 0xcc) {
              if (i + 8 < b.length) { h = be16(b, i + 5); w = be16(b, i + 7) }
              i = b.length
            } else if (m == 0xd8 || (m >= 0xd0 && m <= 0xd9)) i += 2
            else i += 2 + (if (i + 3 < b.length) be16(b, i + 2) else b.length)
          } else i += 1
        }
        MediaMeta(id, "jpeg", b.length, w, h)
      } else if (has(36) && b(0) == 'R' && b(1) == 'I' && b(2) == 'F' && b(3) == 'F' &&
          b(8) == 'W' && b(9) == 'A' && b(10) == 'V' && b(11) == 'E')
        // audio: width = channels, height = sample rate (typed-meta reuse)
        MediaMeta(id, "wav", b.length, le16(b, 22), le32(b, 24))
      else MediaMeta(id, "unknown", b.length, 0, 0)
    } catch { case _: Exception => MediaMeta(id, "unknown", b.length, 0, 0) }
  }

  /** Real header-decode operator: same mapPartitions shape as [[decodeStub]]
    * but running [[sniffMeta]] — actual container parsing in the executors. */
  def sniff(df: DataFrame): Dataset[MediaMeta] = {
    import df.sparkSession.implicits._
    df.select(col("doc_id").cast("long"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) => sniffMeta(id, bytes) })
  }

  /** Per-window audio features over a 16-bit PCM WAV payload. */
  final case class AudioWindow(doc_id: Long, window_idx: Int, n_samples: Int,
      rms: Double, peak: Int, zero_crossings: Int)

  /** REAL audio feature extraction — PCM needs no codec: locate the WAV
    * `data` chunk (chunk walk, not a fixed offset), read interleaved 16-bit
    * little-endian samples of channel 0, and emit RMS energy, peak
    * amplitude and zero-crossing count per fixed-size window. This is the
    * actual compute an audio-quality filter runs before training-data
    * selection; only compressed codecs (mp3/opus) would need external
    * libraries, and those payloads return no rows rather than throwing. */
  def wavWindowFeatures(id: Long, bytes: Array[Byte],
      windowSamples: Int): Seq[AudioWindow] = {
    require(windowSamples > 0, "windowSamples must be positive")
    val b = if (bytes == null) Array.emptyByteArray else bytes
    if (b.length < 44 || b(0) != 'R' || b(1) != 'I' || b(2) != 'F' || b(3) != 'F' ||
        b(8) != 'W' || b(9) != 'A' || b(10) != 'V' || b(11) != 'E') return Nil
    // chunk-walk to BOTH fmt and data (either may be preceded by LIST/fact/
    // cue chunks; fixed offsets 20/22/34 only hold for the canonical
    // layout). Chunk lengths are untrusted: a negative/huge 32-bit length
    // (corrupt or adversarial) must end the walk, not spin it or index out
    // of bounds — the contract is garbage ⇒ no rows, never a throw.
    var li = 12L // Long cursor: summed 31-bit chunk lengths may pass Int.Max
    var dataStart = -1; var dataLen = 0
    var fmtAt = -1
    while (li + 8 <= b.length && (dataStart < 0 || fmtAt < 0)) {
      val i = li.toInt
      val chunkLen = le32(b, i + 4)
      if (chunkLen < 0 || chunkLen > b.length) return Nil // corrupt length
      if (b(i) == 'd' && b(i + 1) == 'a' && b(i + 2) == 't' && b(i + 3) == 'a') {
        dataStart = i + 8
        dataLen = math.min(chunkLen, b.length - dataStart)
      } else if (b(i) == 'f' && b(i + 1) == 'm' && b(i + 2) == 't' && b(i + 3) == ' ')
        fmtAt = i + 8
      li += 8L + chunkLen + (chunkLen & 1) // chunks are word-aligned
    }
    if (dataStart < 0 || fmtAt < 0 || fmtAt + 16 > b.length) return Nil
    val audioFormat = le16(b, fmtAt)
    val channels = math.max(1, le16(b, fmtAt + 2))
    if (audioFormat != 1 || le16(b, fmtAt + 14) != 16) return Nil // PCM16 only
    val stride = 2 * channels // channel 0 of each interleaved frame
    val nFrames = dataLen / stride
    val out = Seq.newBuilder[AudioWindow]
    var w = 0
    while (w * windowSamples < nFrames) {
      val from = w * windowSamples
      val until = math.min(from + windowSamples, nFrames)
      var sumSq = 0.0
      var peak = 0
      var zc = 0
      var prev = 0
      var f = from
      while (f < until) {
        val off = dataStart + f * stride
        val s = ((b(off) & 0xff) | (b(off + 1) << 8)).toShort.toInt
        sumSq += s.toDouble * s
        if (math.abs(s) > peak) peak = math.abs(s)
        if (f > from && ((prev < 0 && s >= 0) || (prev >= 0 && s < 0))) zc += 1
        prev = s
        f += 1
      }
      val n = until - from
      out += AudioWindow(id, w, n, math.sqrt(sumSq / n), peak, zc)
      w += 1
    }
    out.result()
  }

  /** The operator form: (doc_id, payload) → one row per audio window, same
    * mapPartitions batch shape as [[sniff]]; non-WAV payloads contribute
    * nothing (generator semantics, like explode of an empty array). */
  def audioFeatures(df: DataFrame, windowSamples: Int = 1024): Dataset[AudioWindow] = {
    import df.sparkSession.implicits._
    df.select(col("doc_id").cast("long"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, bytes) =>
        wavWindowFeatures(id, bytes, windowSamples) })
  }

  // ------------------------------------------------------------------------
  // REAL pixel decode: the JDK ships lossless image codecs (javax.imageio
  // handles PNG's zlib/filter pipeline and BMP's raster layout with no
  // external library), so pixel-level decode is genuine compute here — the
  // stub below remains only for formats the JDK cannot decode (video,
  // mp3/opus audio).
  // ------------------------------------------------------------------------

  /** Per-image pixel statistics — the quality/feature signal an image
    * training pipeline extracts after decode. */
  final case class ImageStats(doc_id: Long, format: String, width: Int,
      height: Int, n_px: Long, sum_r: Long, sum_g: Long, sum_b: Long)

  /** Output of the REAL resize stage: target dims, per-channel sums of the
    * resized raster, and a position-weighted checksum that pins every
    * output pixel's VALUE AND PLACE (channel sums alone are permutation-
    * blind). */
  final case class ResizeStats(doc_id: Long, width: Int, height: Int,
      sum_r: Long, sum_g: Long, sum_b: Long, chk: Long)

  /** REAL nearest-neighbor image resize: decode the payload with the JDK
    * codec (same path as [[imageStatsOf]]), sample source pixel
    * (⌊x·W/tw⌋, ⌊y·H/th⌋) for each target (x,y), and reduce the resized
    * raster to [[ResizeStats]]. Fully partition-local (no shuffle) —
    * decode+scale is the canonical crawl-ingest thumbnail pass, scaling
    * linearly with executors; undecodable payloads emit no row. */
  def imageResizeStats(df: DataFrame, tw: Int, th: Int): Dataset[ResizeStats] = {
    import df.sparkSession.implicits._
    df.select(col("doc_id").cast("long"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, bytes) =>
        try {
          val b = if (bytes == null) Array.emptyByteArray else bytes
          val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(b))
          if (img == null) None
          else {
            val sw = img.getWidth; val sh = img.getHeight
            var sr = 0L; var sg = 0L; var sb = 0L; var chk = 0L
            var y = 0
            while (y < th) {
              var x = 0
              while (x < tw) {
                val p = img.getRGB(x * sw / tw, y * sh / th)
                val r = (p >> 16) & 0xff; val g = (p >> 8) & 0xff; val bb = p & 0xff
                sr += r; sg += g; sb += bb
                chk += ((r.toLong << 16) | (g << 8) | bb) * (y.toLong * tw + x + 1)
                x += 1
              }
              y += 1
            }
            Some(ResizeStats(id, tw, th, sr, sg, sb, chk))
          }
        } catch { case _: Exception => None }
      })
  }

  /** REAL image encode: render a deterministic RGB gradient
    * (r,g,b at (x,y) = linear forms in x, y, id mod 256) and compress it
    * with the JDK's own PNG (zlib) or BMP writer. Produces a genuine binary
    * container payload — the synthetic stand-in for a crawl's image bytes,
    * with pixel content an oracle can predict in closed form. */
  def synthImage(id: Long, w: Int, h: Int, format: String): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val r = ((x * 3 + y * 5 + id) % 256).toInt
        val g = ((x + y * 2 + id * 7) % 256).toInt
        val b = ((x * 11 + y + id * 13) % 256).toInt
        img.setRGB(x, y, (r << 16) | (g << 8) | b)
        x += 1
      }
      y += 1
    }
    val baos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, format, baos)
    baos.toByteArray
  }

  /** REAL pixel decode: run the payload through the JDK codec
    * (PNG inflate + de-filter, BMP raster walk, GIF LZW — whatever the
    * container sniffs as) and reduce the raster to per-channel sums.
    * Undecodable payloads contribute no rows (generator semantics), never
    * a throw — a crawl batch always contains garbage. */
  def imageStatsOf(id: Long, bytes: Array[Byte]): Option[ImageStats] =
    try {
      val b = if (bytes == null) Array.emptyByteArray else bytes
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(b))
      if (img == null) None
      else {
        val w = img.getWidth; val h = img.getHeight
        var sr = 0L; var sg = 0L; var sb = 0L
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val p = img.getRGB(x, y)
            sr += (p >> 16) & 0xff; sg += (p >> 8) & 0xff; sb += p & 0xff
            x += 1
          }
          y += 1
        }
        Some(ImageStats(id, sniffMeta(id, b).format, w, h, w.toLong * h, sr, sg, sb))
      }
    } catch { case _: Exception => None }

  /** The operator form: (doc_id, payload) → decoded pixel statistics, same
    * mapPartitions batch shape as [[sniff]]/[[audioFeatures]]. Decode is
    * per-row CPU work with no shuffle — linear scaling with executors. */
  def imageStats(df: DataFrame): Dataset[ImageStats] = {
    import df.sparkSession.implicits._
    df.select(col("doc_id").cast("long"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, bytes) => imageStatsOf(id, bytes) })
  }

  /** Deterministic image corpus: one lossless payload per input row — PNG
    * for even ids, BMP for odd (two JDK codecs in one pass), dimensions
    * 8..12 × 8..14 from the id. Encode runs in the executors
    * (partition-local, no shuffle), exactly where a crawl ingest would
    * hand real image bytes to the decode stage. */
  def synthImagePayloads(df: DataFrame): DataFrame = {
    import df.sparkSession.implicits._
    df.select(col("doc_id").cast("long")).as[Long]
      .mapPartitions(_.map { id =>
        val w = (8 + id % 5).toInt
        val h = (8 + id % 7).toInt
        val fmt = if (id % 2 == 0) "png" else "bmp"
        (id, synthImage(id, w, h, fmt))
      }).toDF("doc_id", "payload")
  }

  /** Seed-MIXED gradient: unlike [[synthImage]]'s linear seed term (which
    * shifts all pixels uniformly — aHash is shift-invariant, so every seed
    * would collide), the seed multiplies position-dependent factors, so
    * distinct seeds scramble the block structure and only genuine twins
    * hash together. */
  def synthImageMixed(s: Long, w: Int, h: Int, format: String): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val r = ((x * 3 + y * 5 + (x * y + 1) * s) % 256).toInt
        val g = ((x + y * 2 + (x + y + 2) * s * 7) % 256).toInt
        val b = ((x * 11 + y + (x * 2 + y + 3) * s * 13) % 256).toInt
        img.setRGB(x, y, (r << 16) | (g << 8) | b)
        x += 1
      }
      y += 1
    }
    val baos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, format, baos)
    baos.toByteArray
  }

  /** Seeded variant of [[synthImagePayloads]]: pixel content and dimensions
    * derive from `doc_id div 2`, format from doc-id parity — so every even/
    * odd id pair carries the SAME image in two different containers (PNG
    * zlib vs BMP raster). The synthetic stand-in for the commonest real
    * image near-dup: one picture re-encoded by different sites. */
  def synthImagePayloadsSeeded(df: DataFrame): DataFrame = {
    import df.sparkSession.implicits._
    df.select(col("doc_id").cast("long")).as[Long]
      .mapPartitions(_.map { id =>
        val s = id / 2
        val w = (8 + s % 5).toInt
        val h = (8 + s % 7).toInt
        val fmt = if (id % 2 == 0) "png" else "bmp"
        (id, synthImageMixed(s, w, h, fmt))
      }).toDF("doc_id", "payload")
  }

  /** 64-bit average-hash halves per image. */
  final case class ImageHash(doc_id: Long, ahash_hi: Long, ahash_lo: Long)

  /** REAL perceptual hash (aHash) over the decoded raster, in EXACT integer
    * arithmetic end to end so an oracle can replay it from the generative
    * pixel formula: luminance = 299r+587g+114b (scaled, never divided),
    * 8×8 block value = block-sum div block-count, reference = 64-block-sum
    * div 64, bit b set iff block b strictly exceeds the reference. The two
    * 32-bit halves ship as separate longs — a single 64-bit hash could set
    * bit 63 and overflow signed BIGINT on the oracle side. */
  def imageAHashOf(id: Long, bytes: Array[Byte]): Option[ImageHash] =
    try {
      val b = if (bytes == null) Array.emptyByteArray else bytes
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(b))
      if (img == null) None
      else {
        val w = img.getWidth; val h = img.getHeight
        if (w < 8 || h < 8) None
        else {
          val sums = new Array[Long](64)
          val cnts = new Array[Long](64)
          var y = 0
          while (y < h) {
            val by = y * 8 / h
            var x = 0
            while (x < w) {
              val bx = x * 8 / w
              val p = img.getRGB(x, y)
              val lum = 299L * ((p >> 16) & 0xff) + 587L * ((p >> 8) & 0xff) +
                114L * (p & 0xff)
              val bi = by * 8 + bx
              sums(bi) += lum; cnts(bi) += 1
              x += 1
            }
            y += 1
          }
          val bvals = Array.tabulate(64)(i => sums(i) / cnts(i))
          val mean = bvals.sum / 64
          var hi = 0L; var lo = 0L
          var i = 0
          while (i < 64) {
            if (bvals(i) > mean) {
              if (i < 32) lo |= 1L << i else hi |= 1L << (i - 32)
            }
            i += 1
          }
          Some(ImageHash(id, hi, lo))
        }
      }
    } catch { case _: Exception => None }

  /** The operator form: (doc_id, payload) → aHash halves; undecodable or
    * sub-8×8 payloads contribute nothing. Same partition-local decode
    * shape as [[imageStats]]. */
  def imageAHashes(df: DataFrame): Dataset[ImageHash] = {
    import df.sparkSession.implicits._
    df.select(col("doc_id").cast("long"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, bytes) => imageAHashOf(id, bytes) })
  }

  /** REAL WAV encode of a deterministic square wave: amplitude
    * 1000 + 100·(id mod 50), half-period 8 + (id mod 8) samples, length
    * 2048 + 512·(id mod 4) — canonical 44-byte PCM16 mono header + LE
    * samples. Square waves keep every audio feature in closed form: RMS of
    * a ±A window is EXACTLY A (perfect square through IEEE sqrt), so the
    * oracle predicts even the double-typed column bit-for-bit. */
  def synthWav(id: Long): Array[Byte] = {
    val amp = (1000 + (id % 50) * 100).toInt
    val half = (8 + id % 8).toInt
    val n = (2048 + (id % 4) * 512).toInt
    val sampleRate = 8000
    val dataLen = n * 2
    val bb = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
      .put("WAVE".getBytes("US-ASCII"))
    bb.put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1).putShort(1) // PCM, mono
      .putInt(sampleRate).putInt(sampleRate * 2).putShort(2).putShort(16)
    bb.put("data".getBytes("US-ASCII")).putInt(dataLen)
    var i = 0
    while (i < n) {
      val s = if ((i / half) % 2 == 0) amp else -amp
      bb.putShort(s.toShort)
      i += 1
    }
    bb.array()
  }

  /** Deterministic audio corpus: one WAV payload per input row, encoded in
    * the executors (partition-local, no shuffle). */
  def synthWavPayloads(df: DataFrame): DataFrame = {
    import df.sparkSession.implicits._
    df.select(col("doc_id").cast("long")).as[Long]
      .mapPartitions(_.map(id => (id, synthWav(id)))).toDF("doc_id", "payload")
  }

  // ------------------------------------------------------------------------
  // REAL video-frame decode: uncompressed AVI (RIFF container, '00db' DIB
  // frames) needs no codec — the RIFF walk plus the BMP raster rules
  // (bottom-up rows, BGR byte order, 4-byte row padding) are pure byte
  // layout. Round 6: replaces the frame-sampling stub for this format.
  // ------------------------------------------------------------------------

  final case class VideoFrameStats(doc_id: Long, frame_idx: Long, n_pix: Long,
      sum_r: Long, sum_g: Long, sum_b: Long, tl_lum: Long)

  /** REAL AVI encode of a deterministic RGB gradient video: full RIFF
    * structure (hdrl LIST with avih/strh/strf, movi LIST of '00db' DIB
    * frames — bottom-up rows, BGR, 4-byte-padded). Pixel (x, y) of frame f:
    * r,g,b are linear forms in x, y, f, id mod 256, so an oracle predicts
    * every channel sum in closed form. Dimensions 6..10 × 4..7, 3..6
    * frames, all from the id. */
  def synthAvi(id: Long): Array[Byte] = {
    val w = (6 + id % 5).toInt; val h = (4 + id % 4).toInt
    val nf = (3 + id % 4).toInt
    val stride = (3 * w + 3) / 4 * 4
    val frameBytes = stride * h
    import Multimodal.{riffChunk => chunk, riffList => list}
    val avih = {
      val bb = java.nio.ByteBuffer.allocate(56)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      bb.putInt(100000).putInt(0).putInt(0).putInt(0) // usec/frame, maxbps, pad, flags
        .putInt(nf).putInt(0).putInt(1).putInt(frameBytes) // frames, initial, streams, bufsize
        .putInt(w).putInt(h).putInt(0).putInt(0).putInt(0).putInt(0)
      bb.array()
    }
    val strh = {
      val bb = java.nio.ByteBuffer.allocate(56)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      bb.put("vids".getBytes("US-ASCII")).put("DIB ".getBytes("US-ASCII"))
        .putInt(0).putShort(0).putShort(0).putInt(0) // flags, prio, lang, initial
        .putInt(1).putInt(10).putInt(0).putInt(nf) // scale, rate, start, length
        .putInt(frameBytes).putInt(0).putInt(0) // bufsize, quality, samplesize
        .putShort(0).putShort(0).putShort(w.toShort).putShort(h.toShort)
      bb.array()
    }
    val strf = {
      val bb = java.nio.ByteBuffer.allocate(40)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      bb.putInt(40).putInt(w).putInt(h) // biSize, width, height (+h = bottom-up)
        .putShort(1).putShort(24).putInt(0).putInt(frameBytes) // planes, bpp, BI_RGB, size
        .putInt(0).putInt(0).putInt(0).putInt(0)
      bb.array()
    }
    val frames = (0 until nf).map { f =>
      val body = new Array[Byte](frameBytes)
      var fy = 0 // file row index: row 0 in the FILE is image row h-1
      while (fy < h) {
        val y = h - 1 - fy
        var x = 0
        while (x < w) {
          val r = ((x * 3 + y * 5 + f * 11 + id) % 256).toInt
          val g = ((x + y * 2 + f * 3 + id * 7) % 256).toInt
          val b = ((x * 11 + y + f * 7 + id * 13) % 256).toInt
          val off = fy * stride + x * 3
          body(off) = b.toByte; body(off + 1) = g.toByte; body(off + 2) = r.toByte
          x += 1
        }
        fy += 1
      }
      chunk("00db", body)
    }
    chunk("RIFF", "AVI ".getBytes("US-ASCII") ++
      list("hdrl", chunk("avih", avih), list("strl", chunk("strh", strh),
        chunk("strf", strf))) ++
      list("movi", frames: _*))
  }

  private[ext] def riffChunk(fcc: String, body: Array[Byte]): Array[Byte] = {
    val bb = java.nio.ByteBuffer
      .allocate(8 + body.length + (body.length & 1))
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put(fcc.getBytes("US-ASCII")).putInt(body.length).put(body)
    bb.array() // trailing pad byte (word alignment) stays zero
  }
  private[ext] def riffList(kind: String, parts: Array[Byte]*): Array[Byte] =
    riffChunk("LIST", kind.getBytes("US-ASCII") ++ parts.flatten)

  def synthAviPayloads(df: DataFrame): DataFrame = {
    import df.sparkSession.implicits._
    df.select(col("doc_id").cast("long")).as[Long]
      .mapPartitions(_.map(id => (id, synthAvi(id)))).toDF("doc_id", "payload")
  }

  /** REAL AVI frame decode + frame sampling: walk the RIFF tree (chunk
    * lengths untrusted — corrupt/negative lengths end the walk, never
    * throw), parse strf's BITMAPINFOHEADER, then for every
    * `sampleEvery`-th '00db'/'00dw' frame reduce the bottom-up BGR raster
    * to per-channel sums plus the TOP-LEFT pixel's luminance (image row 0
    * lives at the END of a bottom-up DIB — the one stat that catches a
    * raster-order bug that channel sums cannot). Only BI_RGB 24-bpp
    * streams decode; anything else contributes no rows. */
  /** Shared RIFF walker: iterative over (start, end) chunk-sequence
    * ranges (LIST bodies push a sub-range — depth-first, so hdrl's strf
    * is seen before movi's frames). Chunk lengths are untrusted:
    * corrupt/negative lengths end the walk, never throw. Calls
    * `onFrame(frameIdx, w, h, stride, bodyOffset)` for each DECODABLE
    * sampled frame; every '00db'/'00dw' after a valid strf counts
    * toward frameIdx whether decodable or not. Long cursors — summed
    * 31-bit lengths may pass Int.Max. */
  private def aviWalkFrames(b: Array[Byte], sampleEvery: Int)(
      onFrame: (Long, Int, Int, Int, Int) => Unit): Unit = {
    def fcc(i: Int): String =
      if (i + 4 > b.length) "" else new String(b, i, 4, "US-ASCII")
    if (b.length < 12 || fcc(0) != "RIFF" || fcc(8) != "AVI ") return
    var w = 0; var h = 0; var haveFmt = false
    var frameIdx = 0L
    var stack = List((12L, b.length.toLong))
    while (stack.nonEmpty) {
      var (i, end) = stack.head; stack = stack.tail
      var walking = true
      while (walking && i + 8 <= end) {
        val f4 = fcc(i.toInt)
        val len = le32(b, i.toInt + 4)
        if (len < 0 || i + 8 + len > end) walking = false // corrupt length
        else {
          if (f4 == "LIST" && len >= 4) {
            // depth-first: finish this LIST body before the next sibling
            stack = ((i + 12, i + 8 + len)) :: ((i + 8 + len + (len & 1), end)) :: stack
            walking = false
          } else {
            if (f4 == "strf" && len >= 40) {
              // BITMAPINFOHEADER at the chunk body
              val bo = i.toInt + 8
              val bw = le32(b, bo + 4); val bh = le32(b, bo + 8)
              val bpp = le16(b, bo + 14); val comp = le32(b, bo + 16)
              if (bw > 0 && bh > 0 && bpp == 24 && comp == 0) {
                w = bw; h = bh; haveFmt = true
              }
            } else if ((f4 == "00db" || f4 == "00dw") && haveFmt) {
              val stride = (3 * w + 3) / 4 * 4
              if (frameIdx % sampleEvery == 0 && len >= stride.toLong * h)
                onFrame(frameIdx, w, h, stride, i.toInt + 8)
              frameIdx += 1
            }
            i += 8L + len + (len & 1)
          }
        }
      }
    }
  }

  def aviFrameStatsOf(id: Long, bytes: Array[Byte],
      sampleEvery: Int = 2): Seq[VideoFrameStats] = {
    val b = if (bytes == null) Array.emptyByteArray else bytes
    val out = Seq.newBuilder[VideoFrameStats]
    aviWalkFrames(b, sampleEvery) { (frameIdx, w, h, stride, bo) =>
      var sr = 0L; var sg = 0L; var sb = 0L
      var fy = 0
      while (fy < h) {
        var x = 0
        while (x < w) {
          val off = bo + fy * stride + x * 3
          sb += b(off) & 0xff; sg += b(off + 1) & 0xff
          sr += b(off + 2) & 0xff
          x += 1
        }
        fy += 1
      }
      // top-left in IMAGE coords = first pixel of the LAST file row
      val tl = bo + (h - 1) * stride
      val lum = 299L * (b(tl + 2) & 0xff) + 587L * (b(tl + 1) & 0xff) +
        114L * (b(tl) & 0xff)
      out += VideoFrameStats(id, frameIdx, w.toLong * h, sr, sg, sb, lum)
    }
    out.result()
  }

  /** Seeded AVI corpus for video near-dup: pixel content and dimensions
    * derive from seed = doc_id div 2, so every even/odd id pair carries
    * the same video — EXCEPT frame 1, where odd ids get a red-channel
    * shift. Frame 1 is never sampled at stride 2, so sampled-frame
    * signatures of a pair are identical: the synthetic stand-in for the
    * commonest real video near-dup (same footage, one re-encoded or
    * watermarked frame) and a direct demonstration that frame-sampled
    * dedup is invariant to changes confined to unsampled frames.
    * Dimensions 8..12 × 8..14 (aHash needs ≥ 8×8), 3..5 frames. */
  def synthAviSeeded(id: Long): Array[Byte] = {
    val s = id / 2
    val w = (8 + s % 5).toInt; val h = (8 + s % 7).toInt
    val nf = (3 + s % 3).toInt
    val stride = (3 * w + 3) / 4 * 4
    val frameBytes = stride * h
    val avih = {
      val bb = java.nio.ByteBuffer.allocate(56)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      bb.putInt(100000).putInt(0).putInt(0).putInt(0)
        .putInt(nf).putInt(0).putInt(1).putInt(frameBytes)
        .putInt(w).putInt(h).putInt(0).putInt(0).putInt(0).putInt(0)
      bb.array()
    }
    val strh = {
      val bb = java.nio.ByteBuffer.allocate(56)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      bb.put("vids".getBytes("US-ASCII")).put("DIB ".getBytes("US-ASCII"))
        .putInt(0).putShort(0).putShort(0).putInt(0)
        .putInt(1).putInt(10).putInt(0).putInt(nf)
        .putInt(frameBytes).putInt(0).putInt(0)
        .putShort(0).putShort(0).putShort(w.toShort).putShort(h.toShort)
      bb.array()
    }
    val strf = {
      val bb = java.nio.ByteBuffer.allocate(40)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      bb.putInt(40).putInt(w).putInt(h)
        .putShort(1).putShort(24).putInt(0).putInt(frameBytes)
        .putInt(0).putInt(0).putInt(0).putInt(0)
      bb.array()
    }
    val frames = (0 until nf).map { fr =>
      val tweak = if (fr == 1 && id % 2 == 1) 16L else 0L
      val body = new Array[Byte](frameBytes)
      var fy = 0
      while (fy < h) {
        val y = h - 1 - fy
        var x = 0
        while (x < w) {
          // seed MULTIPLIES position factors (x64's mixed form): aHash
          // is shift-invariant, so a purely additive seed would make
          // every same-dims video collide — mixing scrambles the block
          // structure and only genuine twins hash together
          val r = ((x * 3 + y * 5 + (x * y + 1) * s + fr * 11 + tweak) % 256).toInt
          val g = ((x + y * 2 + (x + y + 2) * s * 7 + fr * 3) % 256).toInt
          val b = ((x * 11 + y + (x * 2 + y + 3) * s * 13 + fr * 7) % 256).toInt
          val off = fy * stride + x * 3
          body(off) = b.toByte; body(off + 1) = g.toByte; body(off + 2) = r.toByte
          x += 1
        }
        fy += 1
      }
      riffChunk("00db", body)
    }
    riffChunk("RIFF", "AVI ".getBytes("US-ASCII") ++
      riffList("hdrl", riffChunk("avih", avih), riffList("strl",
        riffChunk("strh", strh), riffChunk("strf", strf))) ++
      riffList("movi", frames: _*))
  }

  def synthAviPayloadsSeeded(df: DataFrame): DataFrame = {
    import df.sparkSession.implicits._
    df.select(col("doc_id").cast("long")).as[Long]
      .mapPartitions(_.map(id => (id, synthAviSeeded(id)))).toDF("doc_id", "payload")
  }

  final case class VideoFrameHash(doc_id: Long, frame_idx: Long,
      ahash_hi: Long, ahash_lo: Long)

  /** Per-sampled-frame aHash over the decoded DIB raster — the exact
    * integer pipeline of [[imageAHashOf]] (luminance 299r+587g+114b,
    * 8×8 block value = sum div count, bit set iff block > mean), with
    * block indices in IMAGE coordinates (y flipped from the bottom-up
    * file rows). Frames under 8×8 contribute nothing. */
  def aviFrameAHashOf(id: Long, bytes: Array[Byte],
      sampleEvery: Int = 2): Seq[VideoFrameHash] = {
    val b = if (bytes == null) Array.emptyByteArray else bytes
    val out = Seq.newBuilder[VideoFrameHash]
    aviWalkFrames(b, sampleEvery) { (frameIdx, w, h, stride, bo) =>
      if (w >= 8 && h >= 8) {
        val sums = new Array[Long](64)
        val cnts = new Array[Long](64)
        var y = 0
        while (y < h) {
          val fy = h - 1 - y // image row y sits at file row h-1-y
          val by = y * 8 / h
          var x = 0
          while (x < w) {
            val off = bo + fy * stride + x * 3
            val lum = 299L * (b(off + 2) & 0xff) + 587L * (b(off + 1) & 0xff) +
              114L * (b(off) & 0xff)
            val bi = by * 8 + x * 8 / w
            sums(bi) += lum; cnts(bi) += 1
            x += 1
          }
          y += 1
        }
        val bvals = Array.tabulate(64)(i => sums(i) / cnts(i))
        val mean = bvals.sum / 64
        var hi = 0L; var lo = 0L
        var i = 0
        while (i < 64) {
          if (bvals(i) > mean) {
            if (i < 32) lo |= 1L << i else hi |= 1L << (i - 32)
          }
          i += 1
        }
        out += VideoFrameHash(id, frameIdx, hi, lo)
      }
    }
    out.result()
  }

  /** Operator form: partition-local frame decode + hash, no shuffle. */
  def aviFrameAHashes(df: DataFrame, sampleEvery: Int = 2): Dataset[VideoFrameHash] = {
    import df.sparkSession.implicits._
    df.select(col("doc_id").cast("long"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, bytes) =>
        aviFrameAHashOf(id, bytes, sampleEvery) })
  }

  /** Operator form: (doc_id, payload) → sampled decoded frame statistics;
    * partition-local decode, no shuffle — the frame-sampling fan-out
    * happens before any aggregation sees the rows. */
  def aviFrameStats(df: DataFrame, sampleEvery: Int = 2): Dataset[VideoFrameStats] = {
    import df.sparkSession.implicits._
    df.select(col("doc_id").cast("long"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, bytes) =>
        aviFrameStatsOf(id, bytes, sampleEvery) })
  }

  // ------------------------------------------------------------------------
  // REAL compressed-audio decode: IMA ADPCM (WAV format tag 0x11) is a pure
  // INTEGER predictor — step/index tables, shifts and clamps — so decode
  // needs no codec library and an oracle can replay it exactly.
  // ------------------------------------------------------------------------

  private val ImaStep: Array[Int] = Array(
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31, 34, 37,
    41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143, 157, 173,
    190, 209, 230, 253, 279, 307, 337, 371, 408, 449, 494, 544, 598, 658,
    724, 796, 876, 963, 1060, 1166, 1282, 1411, 1552, 1707, 1878, 2066,
    2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428, 4871, 5358, 5894, 6484,
    7132, 7845, 8630, 9493, 10442, 11487, 12635, 13899, 15289, 16818,
    18500, 20350, 22385, 24623, 27086, 29794, 32767)
  private val ImaIndexAdj: Array[Int] =
    Array(-1, -1, -1, -1, 2, 4, 6, 8, -1, -1, -1, -1, 2, 4, 6, 8)

  /** The IMA step: one nibble in, (sample, next index) out — shared by the
    * decoder and the spec-side reference replay. */
  private[graft] def imaStep(pred: Int, idx: Int, nib: Int): (Int, Int) = {
    val step = ImaStep(idx)
    var diff = step >> 3
    if ((nib & 4) != 0) diff += step
    if ((nib & 2) != 0) diff += step >> 1
    if ((nib & 1) != 0) diff += step >> 2
    val p = if ((nib & 8) != 0) pred - diff else pred + diff
    val pc = math.max(-32768, math.min(32767, p))
    val ic = math.max(0, math.min(88, idx + ImaIndexAdj(nib)))
    (pc, ic)
  }

  final case class AdpcmStats(doc_id: Long, n_samples: Long, sum_s: Long,
      max_abs: Long, end_pred: Long, end_index: Long)

  /** REAL IMA-ADPCM WAV encode: format tag 0x11, mono, one block — 4-byte
    * block header (initial predictor int16, step index, reserved) followed
    * by nibbles (low nibble first). Nibble i = (7·i + id) mod 16, initial
    * predictor 10·(id mod 100) − 500, initial index id mod 16, nibble
    * count 64 + 2·(id mod 32) — everything a recursive oracle can replay
    * from the id alone. */
  def synthAdpcmWav(id: Long): Array[Byte] = {
    val nNib = (64 + (id % 32) * 2).toInt
    val pred0 = ((id % 100) * 10 - 500).toInt
    val idx0 = (id % 16).toInt
    val dataLen = 4 + nNib / 2
    val bb = java.nio.ByteBuffer.allocate(12 + 8 + 20 + 8 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(4 + 28 + 8 + dataLen)
      .put("WAVE".getBytes("US-ASCII"))
    bb.put("fmt ".getBytes("US-ASCII")).putInt(20)
      .putShort(17).putShort(1).putInt(8000) // IMA ADPCM, mono
      .putInt(4055).putShort(dataLen.toShort).putShort(4) // byteRate, blockAlign, bits
      .putShort(2).putShort((nNib + 1).toShort) // cbSize, samplesPerBlock
    bb.put("data".getBytes("US-ASCII")).putInt(dataLen)
    bb.putShort(pred0.toShort).put(idx0.toByte).put(0.toByte)
    var j = 0
    while (j < nNib / 2) {
      val lo = ((2 * j * 7 + id) % 16).toInt
      val hi = (((2 * j + 1) * 7 + id) % 16).toInt
      bb.put((lo | (hi << 4)).toByte)
      j += 1
    }
    bb.array()
  }

  def synthAdpcmPayloads(df: DataFrame): DataFrame = {
    import df.sparkSession.implicits._
    df.select(col("doc_id").cast("long")).as[Long]
      .mapPartitions(_.map(id => (id, synthAdpcmWav(id)))).toDF("doc_id", "payload")
  }

  /** REAL IMA-ADPCM decode: chunk-walk to fmt (must be tag 0x11, mono,
    * 4-bit) and data, then run the integer predictor over the nibble
    * stream (block-header predictor is sample 0). Reduces to the
    * training-data audit columns: sample count, sum, peak |amplitude|,
    * and the final predictor state (the decode-integrity check a resumed
    * stream would verify). Garbage/foreign payloads contribute no rows. */
  def adpcmStatsOf(id: Long, bytes: Array[Byte]): Option[AdpcmStats] = {
    val b = if (bytes == null) Array.emptyByteArray else bytes
    def fcc(i: Int): String =
      if (i + 4 > b.length) "" else new String(b, i, 4, "US-ASCII")
    if (b.length < 12 || fcc(0) != "RIFF" || fcc(8) != "WAVE") return None
    var fmtAt = -1; var dataAt = -1; var dataLen = 0
    var li = 12L
    while (li + 8 <= b.length && (fmtAt < 0 || dataAt < 0)) {
      val i = li.toInt
      val chunkLen = le32(b, i + 4)
      if (chunkLen < 0 || chunkLen > b.length) return None // corrupt length
      if (fcc(i) == "fmt " && chunkLen >= 16) fmtAt = i + 8
      else if (fcc(i) == "data") { dataAt = i + 8; dataLen = chunkLen }
      li += 8L + chunkLen + (chunkLen & 1)
    }
    // fmtAt + 16 bound mirrors the audioFeatures walker: a trailing
    // 'fmt ' chunk whose 8-byte header is in bounds but whose 16-byte
    // body is truncated must yield None, never throw (the
    // garbage-yields-no-rows contract of every decoder here).
    if (fmtAt < 0 || dataAt < 0 || dataLen < 4 || fmtAt + 16 > b.length ||
        dataAt.toLong + dataLen > b.length) return None
    if (le16(b, fmtAt) != 17 || le16(b, fmtAt + 2) != 1 ||
        le16(b, fmtAt + 14) != 4) return None // IMA ADPCM, mono, 4-bit only
    var pred = ((b(dataAt) & 0xff) | (b(dataAt + 1) << 8)).toShort.toInt
    var idx = b(dataAt + 2) & 0xff
    if (idx > 88) return None
    var sum = pred.toLong; var maxAbs = math.abs(pred).toLong; var n = 1L
    var j = dataAt + 4
    val end = dataAt + dataLen
    while (j < end) {
      val byte = b(j) & 0xff
      var k = 0
      while (k < 2) {
        val nib = if (k == 0) byte & 0x0f else byte >> 4
        val (p, ix) = imaStep(pred, idx, nib)
        pred = p; idx = ix
        sum += pred; maxAbs = math.max(maxAbs, math.abs(pred).toLong); n += 1
        k += 1
      }
      j += 1
    }
    Some(AdpcmStats(id, n, sum, maxAbs, pred.toLong, idx.toLong))
  }

  /** Operator form: partition-local decode, no shuffle. */
  def adpcmStats(df: DataFrame): Dataset[AdpcmStats] = {
    import df.sparkSession.implicits._
    df.select(col("doc_id").cast("long"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, bytes) => adpcmStatsOf(id, bytes) })
  }

  /** >>> STUB DECODE <<< deterministic pseudo-decode of a binary payload.
    * Retained ONLY for container formats the JDK cannot decode (video
    * codecs, mp3/opus) — lossless images decode for real via
    * [[imageStats]], WAV PCM via [[audioFeatures]], uncompressed AVI via
    * [[aviFrameStats]], IMA-ADPCM via [[adpcmStats]]. */
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

  final case class ResizedMedia(doc_id: Long, width: Int, height: Int,
      payload: Array[Byte])

  /** Resize stage (STUB pixel transform, real operator contract): payload →
    * payload' at the target dimensions, executed batch-at-a-time per
    * partition exactly like a mapInPandas image transform. The stub emits a
    * deterministic stride-sample of the input bytes sized w·h — a real
    * implementation swaps the marked body for a codec decode + scale +
    * re-encode, keeping schema, batching, and binary-in/binary-out shape. */
  def resizeStub(df: DataFrame, w: Int, h: Int): Dataset[ResizedMedia] = {
    import df.sparkSession.implicits._
    df.select(col("doc_id").cast("long"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        // >>> real codec/scaler init would happen once HERE <<<
        it.map { case (id, bytes) =>
          val n = if (bytes == null) 0 else bytes.length
          val out = new Array[Byte](w * h)
          if (n > 0) {
            var i = 0
            while (i < out.length) {
              out(i) = bytes(((i.toLong * n) / out.length).toInt) // stride sample
              i += 1
            }
          }
          ResizedMedia(id, w, h, out)
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
