package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.queries.BeamSchedule

/** The x143 recall-at-scale contract (round-6 VERDICT #1): on a corpus
  * 15× the largest shipped one, the scheduled layer count must recover
  * the recall the fixed catalog knobs lose (the r6 probe measured 0.002
  * raw recall at 30k vectors with the fixed 2-layer form).
  */
class BeamScheduleSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  // the 30k clustered corpus (generator + degenerate-modulus notes)
  // now lives in TestCorpora.clustered30k, shared with the held-out
  // audit in BeamScheduleSpec2
  private def corpus30k = TestCorpora.clustered30k(spark)

  private def recallAt1(k: BeamSchedule.Knobs): Double = {
    val out = BeamSchedule.beamAnnLayered(corpus30k, queryStep = 500L, k)
      .filter(col("rank") === 1L).collect()
    val hits = out.count(r => r.getLong(0) == r.getLong(2) && r.getLong(3) == 0L)
    hits.toDouble / 60.0
  }

  test("scheduleFor: layer count grows as log8(n) with the top layer " +
    "capped at 500 nodes") {
    assert(BeamSchedule.scheduleFor(500L).layers == 1)
    assert(BeamSchedule.scheduleFor(2000L).layers == 2)
    assert(BeamSchedule.scheduleFor(30000L).layers == 3)
    assert(BeamSchedule.scheduleFor(2000000L).layers == 5)
    // constants do NOT grow with n — HNSW's shape
    assert(BeamSchedule.scheduleFor(2000000L).baseHops ==
      BeamSchedule.scheduleFor(500L).baseHops)
  }

  test("real corpus (sf0.001): scheduleFor picks the flat 1-layer form " +
    "at 500 vectors and self-recall@1 is 1.0") {
    val eQ = graft.queries.Ext43.quantized(spark, "/root/testdata/sf0.001")
    val k = BeamSchedule.scheduleFor(500L)
    assert(k.layers == 1)
    val out = BeamSchedule.beamAnnLayered(eQ, 50L, k)
      .filter(col("rank") === 1L).collect()
    assert(out.length == 10)
    assert(out.forall(r => r.getLong(0) == r.getLong(2) && r.getLong(3) == 0L))
    GraftCaches.releasePrior()
  }

  test("an EMPTY upper layer (every node hashed out of the sample) " +
    "degrades to the flat base search instead of silently returning " +
    "zero rows — round-8 ADVICE fallback") {
    // drop every would-be layer-1 member, so the Murmur sample is empty
    val base = spark.range(200)
      .select(col("id").as("vec_id"),
        expr("""transform(sequence(0, 63), i ->
          CAST((id * 17 + i * 13) % 1999 AS BIGINT))""").as("q"))
      .filter(pmod(hash(col("vec_id")), lit(8L)) =!= 0)
    val out = BeamSchedule
      .beamAnnLayered(base, queryStep = 1L, BeamSchedule.Knobs(layers = 2))
      .collect()
    assert(out.nonEmpty, "empty upper layer must not empty the result")
    val rank1 = out.filter(_.getLong(1) == 1L)
    assert(rank1.nonEmpty)
    // flat-search fallback still navigates: self queries retrieve
    // themselves at distance 0
    assert(rank1.forall(r => r.getLong(0) == r.getLong(2) && r.getLong(3) == 0L))
    GraftCaches.releasePrior()
  }

  test("30k-vector corpus: the scheduled form (3 layers) reaches " +
    "self-recall@1 >= 0.9; the fixed catalog shape (2 layers) does not " +
    "— the layer schedule is load-bearing, exactly as the r6 probe " +
    "predicted") {
    val scheduled = recallAt1(BeamSchedule.scheduleFor(30000L))
    val fixed = recallAt1(BeamSchedule.Knobs(layers = 2))
    info(s"30k self-recall@1: scheduled (3 layers) = $scheduled, " +
      s"fixed catalog shape (2 layers, 16 entries) = $fixed")
    assert(scheduled >= 0.9, s"scheduled recall@1 = $scheduled")
    assert(fixed < scheduled,
      s"fixed-knob control should trail the schedule: $fixed vs $scheduled")
    GraftCaches.releasePrior()
  }
}
