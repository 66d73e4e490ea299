package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, rng}
import graft.enrich.BoundaryFill

/** The distributed boundary-exchange gap fill must equal the single-
  * partition global-window formulation on arbitrary inputs and partition
  * counts — including partitions that are entirely null, entirely empty,
  * and boundaries that split a gap run. */
class BoundaryFillSpec extends AnyFunSuite {

  private def check(values: Seq[Option[String]], parts: Int): Unit = {
    val spark = TestSpark.spark
    import spark.implicits._
    val df = values.zipWithIndex
      .map { case (v, i) => (i.toLong, v.orNull) }
      .toDF("seq", "value")
    val dist = BoundaryFill.gapFill(df, parts)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getBoolean(2)))
      .sortBy(_._1).toSeq
    val win = BoundaryFill.gapFillWindow(df)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getBoolean(2)))
      .sortBy(_._1).toSeq
    assert(dist == win, s"parts=$parts values=$values")
  }

  test("hand cases: agree-fill, conflict, edges, all-null partitions") {
    check(Seq(Some("a"), None, Some("a")), 2)
    check(Seq(Some("a"), None, Some("b")), 2)
    check(Seq(None, None, Some("a"), None, None), 3)
    check(Seq(None, None, None), 2)
    check(Seq(Some("x"), None, None, None, Some("x"), None, Some("y")), 4)
  }

  test("randomized equivalence across partition counts") {
    val gen = Gen.listOfN(40,
      Gen.option(Gen.oneOf("a", "b", "c")))
    var seed = rng.Seed(7L)
    for (_ <- 1 to 12) {
      val values = gen.apply(Gen.Parameters.default, seed).get
      seed = seed.next
      for (parts <- Seq(1, 3, 7)) check(values, parts)
    }
  }
}
