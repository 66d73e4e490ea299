package graft.enrich

import org.scalatest.funsuite.AnyFunSuite

import graft.enrich.Rem2Fill.FillIn
import graft.ingest.XmlEntities
import graft.{Pipeline, TestSpark}

/** Scale sanity for the reference-shaped workload: the pipeline handles
  * a 20k-entity feed (20× the real EU feed) end to end, and the fill-pass
  * kernel is genuinely O(n) — 1M rows in ~1 s including JIT warmup. */
class PipelineScaleSpec extends AnyFunSuite {

  test("pipeline processes a 20k-entity feed end to end") {
    val spark = TestSpark.spark
    import spark.implicits._
    val entities = (0 until 20000).map { i =>
      val name = s"Person Num$i"
      s"""<sanctionEntity><subjectType classificationCode="P"/><nameAlias wholeName="$name"/></sanctionEntity>"""
    }.mkString
    val xml = s"<export>$entities</export>"
    val pdf = "Entity 1\nName/Alias: Person Num17\nNumber: N-17\nProgramme: GEN"

    val t0 = System.nanoTime()
    val out = Pipeline.run(
      XmlEntities.fromXmlStrings(Seq(xml).toDF("value")),
      Seq(pdf).toDF("value"))
    val n = out.count()
    val secs = (System.nanoTime() - t0) / 1e9
    assert(n == 20000)
    val matched = out.filter(out("REM2") =!= "").count()
    assert(matched == 1) // only Person Num17 is in the PDF index
    assert(secs < 120, s"pipeline took $secs s for 20k entities")
    info(f"20k entities in $secs%.1f s")
  }

  test("fill-pass kernel is O(n): 1M rows in seconds") {
    val n = 1000000
    val rng = new scala.util.Random(42)
    val input = Array.tabulate(n) { i =>
      val name = s"name${rng.nextInt(n / 2)}" // ~half the names duplicated
      val cand = if (rng.nextInt(3) == 0) "" else s"r${rng.nextInt(100)}"
      FillIn(i.toLong, name, cand)
    }
    val t0 = System.nanoTime()
    val out = Rem2Fill.fillSeq(input)
    val secs = (System.nanoTime() - t0) / 1e9
    assert(out.length == n)
    assert(secs < 5, s"fillSeq took $secs s for 1M rows — not O(n)?")
    info(f"1M rows in $secs%.2f s")
  }
}
