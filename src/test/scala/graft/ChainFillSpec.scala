package graft.enrich

import org.scalatest.funsuite.AnyFunSuite
import scala.util.Random

import graft.enrich.Rem2Fill.{FillIn, FillOut}

/** ChainFill (distributed exact fill) must be BIT-EQUAL to Rem2Fill.fillSeq —
  * the single-sequence reference implementation of main.py:950–1028 — for
  * any input, any partition count. Random fuzzing at small n with many seeds
  * exercises every partition-seam shape (dup runs straddling boundaries,
  * partitions opening on dup rows, the Branch transfer case); the 1M-row run
  * proves the decomposition at scale across many partitions. */
class ChainFillSpec extends AnyFunSuite {

  private def gen(n: Int, seed: Long): Array[FillIn] = {
    val rnd = new Random(seed)
    Array.tabulate(n) { i =>
      val name = rnd.nextInt(10) match {
        case 0 => "UNKNOWN"
        case k => "N" + rnd.nextInt(1 + n / 4) // small pool ⇒ many duplicates
      }
      val cand = if (rnd.nextInt(3) == 0) "" else "r" + rnd.nextInt(3)
      FillIn(i.toLong, name, cand)
    }
  }

  private def distributed(rows: Seq[FillIn], parts: Int): Seq[FillOut] = {
    val spark = graft.TestSpark.spark
    import spark.implicits._
    val df = spark.createDataset(rows).toDF()
      .withColumnRenamed("cand", "rem2_candidate")
    ChainFill(df, parts).as[FillOut].collect().sortBy(_.entity_seq).toSeq
  }

  test("fuzz: equal to fillSeq across seeds and partition counts") {
    for (seed <- 1L to 12L; parts <- Seq(3, 7)) {
      val in = gen(60, seed)
      val expected = Rem2Fill.fillSeq(in).toSeq
      val actual = distributed(in.toSeq, parts)
      assert(actual == expected, s"seed=$seed parts=$parts")
    }
  }

  test("hand-traced seam shapes survive arbitrary partitioning") {
    val cases = Seq(
      // dup run straddles every boundary at parts=4
      Seq(("A", "r"), ("D", ""), ("D", ""), ("D", ""), ("D", ""), ("B", "r")),
      // conflict chain that only pass 3 resolves (FillSpec H2 case)
      Seq(("A", "r"), ("JS", ""), ("M", "s"), ("M", "s"), ("JS", ""), ("B", "r")),
      // overwrite case: dup's own candidate replaced by consensus
      Seq(("A", "r"), ("D", "s"), ("D", ""), ("B", "r")),
      // all-empty candidates
      Seq(("D", ""), ("D", ""), ("E", "")),
      // UNKNOWN everywhere
      Seq(("UNKNOWN", "x"), ("UNKNOWN", ""), ("A", "r")))
    for (c <- cases; parts <- Seq(1, 2, 3, 4)) {
      val in = c.zipWithIndex.map { case ((n, r), i) => FillIn(i.toLong, n, r) }.toArray
      assert(distributed(in.toSeq, parts) == Rem2Fill.fillSeq(in).toSeq,
        s"case=$c parts=$parts")
    }
  }

  test("1M rows across 16 partitions, exact (scale path)") {
    val in = gen(1000000, seed = 42L)
    val expected = Rem2Fill.fillSeq(in).toSeq
    val actual = distributed(in.toSeq, 16)
    assert(actual.length == expected.length)
    // compare without materializing a giant diff message
    var i = 0
    while (i < actual.length) {
      if (actual(i) != expected(i))
        fail(s"first mismatch at $i: ${actual(i)} vs ${expected(i)}")
      i += 1
    }
  }
}
