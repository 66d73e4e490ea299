package graft

import org.scalatest.funsuite.AnyFunSuite

/** x182 ARI + Fowlkes–Mallows: the pair counts re-derived by a
  * genuinely independent O(n²) PAIR-COUNTING loop (never the
  * contingency identity) on planted corpora — identical partitions
  * (ARI = FM = 1e6 exactly), label-permuted cells (still 1e6) — and on
  * full sf0.001; cell assignment replayed with a plain sequential-dot
  * loop off the baked anchors. */
class Ext59Spec extends AnyFunSuite {
  private val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  import graft.ext.IvfCentroids.{K, c}

  private def cellOf(v: Array[Float]): Int = {
    val dots = (0 until K).map { k =>
      var acc = 0.0
      var i = 0
      while (i < v.length) { acc += v(i).toDouble * c(k)(i); i += 1 }
      acc
    }
    // first-index tie-break: argmax with >= against all later
    (0 until K).find(k => (k + 1 until K).forall(j => dots(k) >= dots(j)))
      .getOrElse(K - 1)
  }

  /** O(n²) pair counting → (n, tp, rowsP, colsP, ari_ppm, fm_ppm) with
    * the documented floor spelling. */
  private def replay(rows: Seq[(Int, Array[Float])])
      : (Long, Long, Long, Long, Long, Long) = {
    val asg = rows.map { case (lab, v) => (cellOf(v), lab) }
    var tp = BigInt(0); var rp = BigInt(0); var cp = BigInt(0)
    for (i <- asg.indices; j <- (i + 1) until asg.length) {
      val sameCell = asg(i)._1 == asg(j)._1
      val sameLab = asg(i)._2 == asg(j)._2
      if (sameCell) rp += 1
      if (sameLab) cp += 1
      if (sameCell && sameLab) tp += 1
    }
    val n = BigInt(asg.length)
    val t = n * (n - 1) / 2
    val M = BigInt(1000000)
    val num = (t * tp - rp * cp) * 2
    val den = (t * (rp + cp) - 2 * rp * cp).max(1)
    val ari = if (num < 0) -((-num) * M / den) else num * M / den
    val fm = graft.queries.Ext49.isqrt(
      BigInt("1000000000000") * tp * tp / (rp * cp).max(1))
    (n.toLong, tp.toLong, rp.toLong, cp.toLong, ari.toLong, fm.toLong)
  }

  private def engine(dir: String): (Long, Long, Long, Long, Long, Long) = {
    val r = SparkEntry.queries("x182_adjusted_rand")(spark, dir).head()
    (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
      r.getLong(5))
  }

  private def write(dir: String, rows: Seq[(Int, Array[Float])]): Unit = {
    import spark.implicits._
    rows.zipWithIndex.map { case ((lab, v), i) => (i.toLong, v, lab) }
      .toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
  }

  test("x182 planted identical partitions: ARI = FM = exactly 1e6; a " +
    "label PERMUTATION of the cells still scores 1e6") {
    val dirA = TestSpark.scratchDir("x182a")
    // embeddings sitting on the anchor directions → cell k; label = k
    def onAnchor(k: Int) = c(k).map(x => (0.5 * x).toFloat).toArray
    val ident = (0 until 40).map(i => (i % K, onAnchor(i % K)))
    write(dirA, ident)
    val gotA = engine(dirA)
    assert(gotA == replay(ident))
    assert(gotA._5 == 1000000L && gotA._6 == 1000000L)
    val dirB = TestSpark.scratchDir("x182b")
    val perm = (0 until 40).map(i => ((i % K + 1) % K, onAnchor(i % K)))
    write(dirB, perm)
    val gotB = engine(dirB)
    assert(gotB == replay(perm))
    assert(gotB._5 == 1000000L && gotB._6 == 1000000L)
  }

  test("x182 sf0.001 == O(n²) pair-counting replay") {
    val rows = spark.read.parquet(s"$sf/embeddings.parquet")
      .select("label", "embedding").collect()
      .map(r => (r.getInt(0), r.getSeq[Float](1).toArray)).toSeq
    assert(engine(sf) == replay(rows))
  }

  // ---- x186 B-cubed ----------------------------------------------------

  /** Replay from raw assignments (independent of Ext28's frame),
    * grouped by denominator so the floors match the engine's spelling
    * exactly; the per-element O(n²) ⇔ contingency-identity equivalence
    * is Fraction-exact (pinned in the python prototype and by algebra:
    * Σ_e |cl(e) ∩ cls(e)|/|cl(e)| regroups by (cell, label) cell). */
  private def replayB3(rows: Seq[(Int, Array[Float])])
      : (Long, Long, Long, Long) = {
    val asg = rows.map { case (lab, v) => (cellOf(v), lab) }
    val n = BigInt(asg.length)
    val M = BigInt(1000000)
    // group the per-element fractions by their denominators so the
    // per-group floors match the engine's spelling exactly
    def side(keyOf: ((Int, Int)) => Int): BigInt =
      asg.groupBy(keyOf).values.map { grp =>
        val q = grp.groupBy(identity).values
          .map(g => BigInt(g.length) * g.length).sum
        q * M / grp.length
      }.sum / n.max(1)
    val p = side(_._1)
    val r = side(_._2)
    (n.toLong, p.toLong, r.toLong, (2 * p * r / (p + r).max(1)).toLong)
  }

  private def engineB3(dir: String): (Long, Long, Long, Long) = {
    val r = SparkEntry.queries("x186_bcubed")(spark, dir).head()
    (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
  }

  test("x186 planted identical partitions: P = R = F = exactly 1e6") {
    val dir = TestSpark.scratchDir("x186a")
    def onAnchor(k: Int) = c(k).map(x => (0.5 * x).toFloat).toArray
    val ident = (0 until 40).map(i => (i % K, onAnchor(i % K)))
    write(dir, ident)
    val got = engineB3(dir)
    assert(got == replayB3(ident))
    assert(got == ((40L, 1000000L, 1000000L, 1000000L)))
  }

  test("x186 sf0.001 == per-element brute replay") {
    val rows = spark.read.parquet(s"$sf/embeddings.parquet")
      .select("label", "embedding").collect()
      .map(r => (r.getInt(0), r.getSeq[Float](1).toArray)).toSeq
    assert(engineB3(sf) == replayB3(rows))
  }
}
