package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.ext.Multimodal

/** Round-6 batch 2: real AVI frame decode and IMA-ADPCM decode — raster-
  * order and predictor-state checks against independent replays, plus the
  * garbage-in ⇒ no-rows contract every multimodal decoder keeps.
  */
class Ext42Spec extends AnyFunSuite {

  // ------------------------------------------------------------ x140 / AVI

  test("aviFrameStatsOf: sampled frames match an independent replay of the " +
    "generative pixel formula, including the raster-order-sensitive tl_lum") {
    for (id <- Seq(0L, 1L, 7L, 19L, 123L)) {
      val w = (6 + id % 5).toInt; val h = (4 + id % 4).toInt
      val nf = (3 + id % 4).toInt
      val got = Multimodal.aviFrameStatsOf(id, Multimodal.synthAvi(id), 2)
      val want = (0 until nf).filter(_ % 2 == 0).map { f =>
        var sr = 0L; var sg = 0L; var sb = 0L
        for (y <- 0 until h; x <- 0 until w) {
          sr += (x * 3 + y * 5 + f * 11 + id) % 256
          sg += (x + y * 2 + f * 3 + id * 7) % 256
          sb += (x * 11 + y + f * 7 + id * 13) % 256
        }
        val lum = 299L * ((f * 11 + id) % 256) + 587L * ((f * 3 + id * 7) % 256) +
          114L * ((f * 7 + id * 13) % 256)
        Multimodal.VideoFrameStats(id, f, w.toLong * h, sr, sg, sb, lum)
      }
      assert(got == want, s"id=$id")
    }
  }

  test("aviFrameStatsOf: tl_lum reads the BOTTOM of the file buffer — a " +
    "top-down mis-decode would return frame-row-0 instead") {
    // height ≥ 2 for every id, and the pixel formula depends on y, so the
    // top-left (image y=0) and bottom-left (image y=h-1) luminances differ
    val id = 3L
    val h = (4 + id % 4).toInt
    val stats = Multimodal.aviFrameStatsOf(id, Multimodal.synthAvi(id), 2)
    val y0 = 299L * ((0 * 3 + 0 * 5 + id) % 256) +
      587L * ((0 + 0 * 2 + id * 7) % 256) + 114L * ((0 * 11 + 0 + id * 13) % 256)
    val yb = 299L * ((0 * 3 + (h - 1) * 5 + id) % 256) +
      587L * ((0 + (h - 1) * 2 + id * 7) % 256) +
      114L * ((0 * 11 + (h - 1) + id * 13) % 256)
    assert(y0 != yb, "formula must separate the two rows for this to test anything")
    assert(stats.head.tl_lum == y0)
  }

  test("aviFrameStatsOf: garbage, truncated, and foreign payloads yield no rows") {
    val good = Multimodal.synthAvi(5L)
    assert(Multimodal.aviFrameStatsOf(1L, null).isEmpty)
    assert(Multimodal.aviFrameStatsOf(1L, Array[Byte](1, 2, 3)).isEmpty)
    assert(Multimodal.aviFrameStatsOf(1L, "RIFFxxxxWAVE".getBytes).isEmpty)
    assert(Multimodal.aviFrameStatsOf(1L, good.take(40)).isEmpty)
    // corrupt chunk length inside a valid RIFF header: walk must stop clean
    val corrupt = good.clone()
    corrupt(16) = 0xff.toByte; corrupt(17) = 0xff.toByte
    corrupt(18) = 0xff.toByte; corrupt(19) = 0x7f.toByte
    assert(Multimodal.aviFrameStatsOf(1L, corrupt).isEmpty)
  }

  test("aviFrameStats operator: decode inside a Spark plan, sampling rate 2") {
    val spark = TestSpark.spark
    import spark.implicits._
    val ids = Seq(0L, 1L, 2L, 3L).toDF("doc_id")
    val out = Multimodal.aviFrameStats(Multimodal.synthAviPayloads(ids), 2)
      .collect().toSeq.sortBy(s => (s.doc_id, s.frame_idx))
    // nf = 3 + id%4 → sampled = ceil(nf/2): id0→2of3, id1→2of4, id2→3of5, id3→3of6
    assert(out.map(_.doc_id).groupBy(identity).view.mapValues(_.size).toMap ==
      Map(0L -> 2, 1L -> 2, 2L -> 3, 3L -> 3))
    assert(out.forall(_.frame_idx % 2 == 0))
  }

  // ---------------------------------------------------------- x142 / ADPCM

  test("adpcmStatsOf: decode matches an independent predictor replay of the " +
    "generator (nibbles never touch bytes in the replay)") {
    for (id <- Seq(0L, 1L, 42L, 99L, 131L)) {
      val nNib = (64 + (id % 32) * 2).toInt
      var pred = ((id % 100) * 10 - 500).toInt
      var idx = (id % 16).toInt
      var sum = pred.toLong; var mx = math.abs(pred).toLong
      for (i <- 0 until nNib) {
        val (p, ix) = Multimodal.imaStep(pred, idx, ((i * 7 + id) % 16).toInt)
        pred = p; idx = ix
        sum += pred; mx = math.max(mx, math.abs(pred))
      }
      val got = Multimodal.adpcmStatsOf(id, Multimodal.synthAdpcmWav(id))
      assert(got.contains(Multimodal.AdpcmStats(
        id, nNib + 1L, sum, mx, pred.toLong, idx.toLong)), s"id=$id")
    }
  }

  test("adpcmStatsOf: clamps engage (predictor pinned at ±32768/32767 " +
    "boundary never overflows 16 bits)") {
    // all-7 nibbles push the predictor up hard; all-15 pull down hard —
    // run both through a long stream and check the clamp holds
    for (nib <- Seq(7, 15)) {
      var pred = 0; var idx = 88
      for (_ <- 0 until 200) {
        val (p, ix) = Multimodal.imaStep(pred, idx, nib)
        pred = p; idx = ix
        assert(pred >= -32768 && pred <= 32767)
      }
    }
  }

  test("adpcmStatsOf: garbage, PCM (wrong tag), stereo, and short-data " +
    "payloads yield no rows") {
    assert(Multimodal.adpcmStatsOf(1L, null).isEmpty)
    assert(Multimodal.adpcmStatsOf(1L, Array[Byte](82, 73)).isEmpty)
    // a PCM16 wav (format tag 1) must NOT decode through the ADPCM path
    assert(Multimodal.adpcmStatsOf(1L, Multimodal.synthWav(1L)).isEmpty)
    val good = Multimodal.synthAdpcmWav(9L)
    assert(Multimodal.adpcmStatsOf(9L, good.take(50)).isEmpty)
    // corrupt step index (>88) in the block header
    val corrupt = good.clone()
    val dataAt = good.indexOfSlice("data".getBytes) + 8
    corrupt(dataAt + 2) = 120.toByte
    assert(Multimodal.adpcmStatsOf(9L, corrupt).isEmpty)
    // 'data' chunk first, then a TRAILING 'fmt ' whose 8-byte header is
    // in bounds but whose declared 16-byte body is truncated — must be
    // None, not ArrayIndexOutOfBounds at the fmt field reads
    val bb = java.nio.ByteBuffer.allocate(44)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(36)
    bb.put("WAVE".getBytes("US-ASCII"))
    bb.put("data".getBytes("US-ASCII")).putInt(8).putLong(0L)
    bb.put("fmt ".getBytes("US-ASCII")).putInt(16).putInt(0) // 4 of 16 bytes
    assert(Multimodal.adpcmStatsOf(9L, bb.array()).isEmpty)
  }

  test("decoder fuzz: 600 random mutations of valid AVI/ADPCM payloads " +
    "(byte flips, truncations, splices) never throw — garbage yields " +
    "fewer or zero rows, never an exception") {
    val rnd = new scala.util.Random(42) // seeded: deterministic replay
    def mutate(base: Array[Byte]): Array[Byte] = rnd.nextInt(3) match {
      case 0 => // flip 1-8 random bytes
        val b = base.clone()
        (0 until 1 + rnd.nextInt(8)).foreach { _ =>
          b(rnd.nextInt(b.length)) = rnd.nextInt(256).toByte }
        b
      case 1 => base.take(rnd.nextInt(base.length)) // truncate anywhere
      case _ => // splice a random window of one payload into another
        val b = base.clone()
        val at = rnd.nextInt(b.length)
        val n = math.min(rnd.nextInt(64), b.length - at)
        (0 until n).foreach(i => b(at + i) = rnd.nextInt(256).toByte)
        b
    }
    for (i <- 0 until 300) {
      val id = rnd.nextInt(200).toLong
      val avi = mutate(Multimodal.synthAvi(id))
      val stats = Multimodal.aviFrameStatsOf(id, avi) // must not throw
      stats.foreach(s => assert(s.n_pix > 0))
      val hashes = Multimodal.aviFrameAHashOf(id,
        mutate(Multimodal.synthAviSeeded(id))) // must not throw
      assert(hashes.size <= 5)
    }
    for (_ <- 0 until 300) {
      val id = rnd.nextInt(200).toLong
      val wav = mutate(Multimodal.synthAdpcmWav(id))
      Multimodal.adpcmStatsOf(id, wav).foreach { s => // must not throw
        assert(s.n_samples >= 1 && s.max_abs <= 32768)
        assert(s.end_index >= 0 && s.end_index <= 88)
      }
    }
  }

  test("adpcmStats operator: one stats row per payload in a Spark plan") {
    val spark = TestSpark.spark
    import spark.implicits._
    val ids = Seq(10L, 11L, 12L).toDF("doc_id")
    val out = Multimodal.adpcmStats(Multimodal.synthAdpcmPayloads(ids))
      .collect().toSeq.sortBy(_.doc_id)
    assert(out.map(_.doc_id) == Seq(10L, 11L, 12L))
    assert(out.forall(s => s.n_samples == 65L + (s.doc_id % 32) * 2))
  }
}
