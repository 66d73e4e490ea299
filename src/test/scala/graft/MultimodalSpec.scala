package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.ext.Multimodal

/** Multimodal plumbing: binary column in, typed datasets out, deterministic
  * across runs and partitionings (the stub decode must behave like a pure
  * per-row decoder). */
class MultimodalSpec extends AnyFunSuite {

  private lazy val payloads = {
    val spark = TestSpark.spark
    spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"), col("text").cast("binary").as("payload"))
  }

  test("decodeStub: typed metadata, one row per payload, deterministic") {
    val out1 = Multimodal.decodeStub(payloads).collect().sortBy(_.doc_id)
    val out2 = Multimodal.decodeStub(payloads.repartition(7)).collect().sortBy(_.doc_id)
    assert(out1.length == 500)
    assert(out1.toSeq == out2.toSeq) // partitioning must not change results
    assert(out1.forall(m => m.width >= 16 && m.height >= 16 && m.n_bytes > 0))
    assert(out1.map(_.format).toSet.subsetOf(Set("png", "jpeg", "webp")))
  }

  test("sampleFrames: nFrames rows per payload, stable frame hashes") {
    val out = Multimodal.sampleFrames(payloads.limit(10), 4).collect()
    assert(out.length == 40)
    assert(out.groupBy(_.doc_id).forall(_._2.map(_.frame_idx).sorted.sameElements(0 until 4)))
  }

  test("embedStub: fixed-width float vectors usable by the similarity ops") {
    val spark = TestSpark.spark
    import spark.implicits._
    val emb = Multimodal.embedStub(payloads.limit(50), dim = 16)
    val df = emb.toDF()
    assert(df.select(size(col("embedding"))).distinct().as[Int].collect().toSeq == Seq(16))
    // plumb straight into the cosine primitive from ext/Similarity
    val e = df.select(col("doc_id"), col("embedding").cast("array<double>").as("v"))
    val q = e.filter(col("doc_id") === 0)
      .select(col("v").as("qv"))
    val sims = q.crossJoin(e)
      .select(col("doc_id"), graft.ext.Similarity.cosine(col("qv"), col("v")).as("cos"))
      .collect()
    assert(sims.length == 50)
    val self = sims.find(_.getLong(0) == 0).get.getDouble(1)
    assert(math.abs(self - 1.0) < 1e-12) // self-similarity
  }
}
