package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Scale sanity for the round-5 part-5/6 additions: the containment audit
  * must track rare-shingle collisions (never n²) and the greedy k-center
  * selection must stay O(k) jobs with nothing corpus-sized on the driver.
  * Like SpanScaleSpec, the catalog lambdas read parquet from a directory,
  * so each test materializes a synthetic fixture and drives the real
  * entries. */
class Ext27ScaleSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  private def withDir(tag: String)(body: java.io.File => Unit): Unit = {
    val dir = new java.io.File(
      sys.props("java.io.tmpdir"), s"graft_${tag}_${System.nanoTime()}")
    try body(dir)
    finally {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(); ()
      }
      rm(dir)
    }
  }

  test("x102: 101k docs with planted quotes — exactly the planted subset " +
    "pairs surface, in seconds (candidates track df-2 shingles, not n²)") {
    withDir("x102_scale") { dir =>
      val n = 100000L
      // base doc i: 16 tokens unique to i (14 shingles, df=1 — generate
      // no candidates); every 100th doc gets a QUOTE twin (id n+i) made of
      // its first 8 tokens, so exactly 6 shingles reach df=2
      val base = spark.range(n).select(col("id").as("doc_id"),
        concat_ws(" ",
          expr("transform(sequence(1, 16), j -> concat('u', id, '_', j))"))
          .as("text"))
      val quotes = spark.range(n).filter(col("id") % 100 === 0)
        .select((col("id") + n).as("doc_id"),
          concat_ws(" ",
            expr("transform(sequence(1, 8), j -> concat('u', id, '_', j))"))
            .as("text"))
      base.union(quotes)
        .withColumn("lang", lit("en"))
        .withColumn("source", concat(lit("src"), col("doc_id") % 20))
        .withColumn("n_chars", length(col("text")))
        .repartition(32)
        .write.mode("overwrite").parquet(s"$dir/documents.parquet")
      val t0 = System.nanoTime()
      val got = SparkEntry.queries("x102_containment")(spark, dir.toString)
        .collect()
      val secs = (System.nanoTime() - t0) / 1e9
      assert(got.length == (n / 100).toInt,
        s"expected ${n / 100} planted pairs, got ${got.length}")
      assert(got.forall { r =>
        r.getLong(0) + n == r.getLong(1) &&   // (base, its quote)
        r.getLong(2) == 14L && r.getLong(3) == 6L && r.getLong(4) == 6L &&
        r.getLong(5) == 6L * 1000000L / 14L &&  // cont base→quote
        r.getLong(6) == 1000000L &&             // quote fully contained
        r.getLong(7) == 6L * 1000000L / 14L
      }, s"unexpected pair rows: ${got.take(3).mkString("; ")}")
      assert(secs < 120, s"containment too slow at ${n} docs: $secs s")
      GraftCaches.releasePrior()
    }
  }

  test("x103: 300k x 16-dim vectors — selection equals the exact integer " +
    "replay; O(k) jobs, only k rows ever reach the driver") {
    withDir("x103_scale") { dir =>
      val n = 300000L
      spark.range(n).select(col("id").as("vec_id"),
        expr("transform(sequence(0, 15), j -> cast((id*31 + j*17) % 101 - 50 as float))")
          .as("embedding"),
        (col("id") % 8).cast("int").as("label"))
        .repartition(32)
        .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
      val t0 = System.nanoTime()
      val got = SparkEntry.queries("x103_kcenter_coreset")(spark, dir.toString)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      val secs = (System.nanoTime() - t0) / 1e9
      // exact replay in Long arithmetic (all coords are small ints, so the
      // double fold in the query is integer-exact)
      def vec(id: Long): Array[Long] =
        Array.tabulate(16)(j => (id * 31 + j * 17) % 101 - 50)
      def d2(a: Array[Long], b: Array[Long]): Long =
        (0 until 16).map(i => (a(i) - b(i)) * (a(i) - b(i))).sum
      // coords depend only on id % 101, so distances repeat with period
      // 101: scan one period for the geometry, ids resolve by min id in
      // class — EXCEPT the argmax tie-break, which is the smallest vec_id
      // overall. Replay honestly over all n instead (fast enough).
      var sel = Vector((0L, vec(0L), 0L))
      while (sel.size < 4) {
        var bestId = -1L; var bestD = -1L
        var id = 0L
        while (id < n) {
          if (!sel.exists(_._1 == id)) {
            var dm = Long.MaxValue
            val v = vec(id)
            sel.foreach { c => val d = d2(v, c._2); if (d < dm) dm = d }
            if (dm > bestD) { bestD = dm; bestId = id }
          }
          id += 1
        }
        sel = sel :+ ((bestId, vec(bestId), bestD))
      }
      val want = sel.zipWithIndex.map { case ((id, _, d), i) =>
        (i + 1L, id, d.toDouble) }
      assert(got.toSeq == want)
      assert(secs < 120, s"k-center too slow at ${n} vectors: $secs s")
      GraftCaches.releasePrior()
    }
  }
}
