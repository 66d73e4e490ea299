package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Scale sanity for x141 per-line dedup: 1M documents × 3 synthetic
  * lines with a deliberately pathological duplicate structure — one
  * GLOBAL line present in every document (a single md5 key with 1M
  * occurrences: the boilerplate hot key the AQE skew path must absorb),
  * one pair line shared by each even/odd id pair, one unique line per
  * document. Every ledger column is closed-form; the run must stay in
  * seconds with one keyed shuffle + join, no window, no pair blowup. */
class Ext41ScaleSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  test("x141: 1M docs, 3M lines, one 1M-occurrence hot line — ledger " +
    "matches the closed form exactly") {
    val dir = new java.io.File(
      sys.props("java.io.tmpdir"), s"graft_x141_scale_${System.nanoTime()}")
    try {
      val n = 1000000L
      // text = G(10 toks, global) ++ P_k(10 toks, k = id div 2) ++
      //        U_i(10 toks, unique) → exactly 3 lines of 10
      spark.range(n).select(col("id").as("doc_id"),
          concat_ws(" ",
            expr("concat_ws(' ', transform(sequence(0, 9), j -> concat('g', j)))"),
            expr("concat_ws(' ', transform(sequence(0, 9), j -> concat('p', id div 2, '_', j)))"),
            expr("concat_ws(' ', transform(sequence(0, 9), j -> concat('u', id, '_', j)))"))
            .as("text"),
          lit("en").as("lang"), lit("s").as("source"), lit(0L).as("n_chars"))
        .write.mode("overwrite").parquet(s"$dir/documents.parquet")

      val t0 = System.nanoTime()
      val out = SparkEntry.queries("x141_line_dedup")(spark, dir.toString)
      val agg = out.agg(
        count(lit(1)).as("docs"),
        sum(col("n_lines")).as("lines"),
        sum(col("n_kept")).as("kept"),
        sum(col("n_dropped")).as("dropped"),
        sum(col("toks_kept")).as("toks"),
        sum(col("n_dup_lines")).as("dups")).collect().head
      val secs = (System.nanoTime() - t0) / 1e9

      // closed form: doc 0 keeps all 3 (it owns G, P_0, U_0);
      // even i>0 keeps P_k + U_i = 2; odd keeps U_i = 1
      val kept = 3L + (n / 2 - 1) * 2 + (n / 2) * 1
      assert(agg.getAs[Long]("docs") == n)
      assert(agg.getAs[Long]("lines") == 3 * n)
      assert(agg.getAs[Long]("kept") == kept)
      assert(agg.getAs[Long]("dropped") == 3 * n - kept)
      assert(agg.getAs[Long]("toks") == 10 * kept)
      // every doc has exactly 2 corpus-duplicated lines (G and its P)
      assert(agg.getAs[Long]("dups") == 2 * n)
      // spot rows: the hot line's keeper and a late odd doc
      val rows = out.filter(col("doc_id").isin(0L, 999999L))
        .collect().map(r => r.getLong(0) -> ((r.getLong(2), r.getLong(3)))).toMap
      assert(rows(0L) == (3L, 0L))     // doc 0: keeps G, P_0, U_0
      assert(rows(999999L) == (1L, 2L)) // odd tail doc: keeps only U
      info(f"1M docs / 3M lines (one 1M-occurrence hot key) in $secs%.1f s")
      assert(secs < 120, s"x141 took $secs s at 1M docs")
      GraftCaches.releasePrior()
    } finally {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(); ()
      }
      rm(dir)
    }
  }
}
