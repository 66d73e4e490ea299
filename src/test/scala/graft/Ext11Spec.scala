package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.ext.Multimodal

/** Round-5 batch 3: perceptual-hash image near-dup and windowed audio
  * features. Pins the re-encode recall that is x64's reason to exist, the
  * container-invariance of the hash itself, and the closed-form audio
  * features on a hand-checked square wave. */
class Ext11Spec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  test("imageAHashOf: identical pixels hash identically across PNG and BMP") {
    val png = Multimodal.synthImageMixed(7L, 10, 9, "png")
    val bmp = Multimodal.synthImageMixed(7L, 10, 9, "bmp")
    val hPng = Multimodal.imageAHashOf(1L, png).get
    val hBmp = Multimodal.imageAHashOf(2L, bmp).get
    assert(hPng.ahash_hi == hBmp.ahash_hi && hPng.ahash_lo == hBmp.ahash_lo)
    // and a different seed hashes differently (the mixed gradient is not
    // shift-invariant like the linear one)
    val other = Multimodal.imageAHashOf(3L,
      Multimodal.synthImageMixed(8L, 10, 9, "png")).get
    assert(other.ahash_hi != hPng.ahash_hi || other.ahash_lo != hPng.ahash_lo)
  }

  test("imageAHashOf: garbage and sub-8x8 payloads contribute nothing") {
    assert(Multimodal.imageAHashOf(1L, Array[Byte](1, 2, 3)).isEmpty)
    assert(Multimodal.imageAHashOf(2L, null).isEmpty)
    val tiny = Multimodal.synthImage(1L, 4, 4, "png")
    assert(Multimodal.imageAHashOf(3L, tiny).isEmpty)
  }

  test("x64_image_ahash: every re-encode twin surfaces at Hamming 0") {
    val sf = "/root/testdata/sf0.001"
    val out = SparkEntry.queries("x64_image_ahash")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val nDocs = graft.tables.Tables.documents(spark, sf).count()
    val twins = out.filter(p => p._1 % 2 == 0 && p._2 == p._1 + 1)
    assert(twins.length == nDocs / 2, "one pair per even/odd twin")
    twins.foreach { case (a, b, ham) => assert(ham == 0L, s"twin ($a,$b)") }
  }

  test("x65_audio_features: closed-form square-wave windows for one doc") {
    import spark.implicits._
    val d = java.nio.file.Files.createTempDirectory("graft-ext11").toString
    // doc_id=5: amp=1500, half=13, n=2560 → windows 1024,1024,512
    Seq((5L, "t", "en", "s", 1L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$d/documents.parquet")
    val out = SparkEntry.queries("x65_audio_features")(spark, d)
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getDouble(3),
        r.getLong(4), r.getLong(5)))
    def zc(from: Long, ns: Long) = (from + ns - 1) / 13 - from / 13
    assert(out.toSeq === Seq(
      (0L, 1024L, 1500.0, 1500L, zc(0, 1024)),
      (1L, 1024L, 1500.0, 1500L, zc(1024, 1024)),
      (2L, 512L, 1500.0, 1500L, zc(2048, 512))))
  }

  test("wavWindowFeatures: corrupt payloads yield no rows, never throw") {
    assert(Multimodal.wavWindowFeatures(1L, null, 1024).isEmpty)
    assert(Multimodal.wavWindowFeatures(1L, Array[Byte](1), 1024).isEmpty)
    // truncate a real WAV mid-header
    val wav = Multimodal.synthWav(3L)
    assert(Multimodal.wavWindowFeatures(1L, wav.take(30), 1024).isEmpty)
    // and a real one decodes
    assert(Multimodal.wavWindowFeatures(3L, wav, 1024).nonEmpty)
  }
}
