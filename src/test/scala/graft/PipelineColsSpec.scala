package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** pipeline_sanctions_cols runs ONLY the XML parse + enrich branch (the
  * PDF / match / fill arms are dead weight for its projection and are
  * pruned by construction) — this golden pins that the shortcut is
  * value-identical to projecting the FULL pipeline output, cell for
  * cell, so the pruning can never silently diverge from the flagship.
  */
class PipelineColsSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  private val cols = Seq("entity_seq", "FULL_NAME", "CATEGORY", "GENDER",
    "DOB", "ADD_CITY", "NATIONALITIES", "ADD_COUNTRY", "STATE",
    "ADDRESS", "DETAILS", "ALIAS", "REM1",
    "WEB_LINK", "SOURCE", "flag_name_missing", "flag_category_missing")

  test("pipeline_sanctions_cols == the full pipeline's projection, " +
    "cell for cell") {
    val short = SparkEntry.queries("pipeline_sanctions_cols")(spark, "")
      .collect().map(_.toSeq).toSeq
    val full = graft.Pipeline.runFixture(spark)
      .select(cols.map(col): _*)
      .collect().map(_.toSeq).toSeq
    assert(short.nonEmpty)
    assert(short == full)
    GraftCaches.releasePrior()
  }
}
