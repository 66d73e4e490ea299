package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Since round 13, pipeline_sanctions_cols runs the COMPOSED pipeline
  * (Pipeline.runFixture — XML parse + enrich + PDF match + two-pass fill)
  * and projects every oracle-covered column, REM2 and its flags included.
  * This golden pins that the catalog entry stays in lockstep with the
  * flagship frame cell for cell — a drifted projection list, a dropped
  * column, or a shortcut reintroduced without oracle coverage fails here
  * before it reaches the driver gate.
  */
class PipelineColsSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  private val cols = Seq("entity_seq", "FULL_NAME", "CATEGORY", "GENDER",
    "DOB", "ADD_CITY", "NATIONALITIES", "ADD_COUNTRY", "STATE",
    "ADDRESS", "DETAILS", "ALIAS", "REM1",
    "WEB_LINK", "SOURCE", "REM2",
    "flag_name_missing", "flag_category_missing",
    "flag_rem2_missing", "flag_rem2_conflict")

  test("pipeline_sanctions_cols == the full pipeline's projection, " +
    "cell for cell, REM2 + fill flags included") {
    val twin = SparkEntry.queries("pipeline_sanctions_cols")(spark, "")
    assert(twin.columns.toSeq == cols,
      "the twin's projection drifted from the oracle-covered column list")
    val short = twin.collect().map(_.toSeq).toSeq
    val full = graft.Pipeline.runFixture(spark)
      .select(cols.map(col): _*)
      .collect().map(_.toSeq).toSeq
    assert(short.nonEmpty)
    assert(short == full)
    // the REM2 arm is genuinely exercised, by SPECIFIC rows (ADVICE r13:
    // a bare count of 7 would survive a fill-vs-direct swap): direct/
    // match hits land on entity_seq 0, 6, 7; the four chain-fill rows
    // are 2–5; rows 1 and 8 stay empty (PipelineSpec pins exact values)
    val seqIdx = cols.indexOf("entity_seq")
    val nonEmptySeqs = short
      .filter(r => r(cols.indexOf("REM2")).asInstanceOf[String].nonEmpty)
      .map(r => r(seqIdx).asInstanceOf[Long]).toSet
    assert(nonEmptySeqs == Set(0L, 2L, 3L, 4L, 5L, 6L, 7L))
    GraftCaches.releasePrior()
  }
}
