package graft

import java.nio.file.Files
import org.apache.spark.sql.execution.FormattedMode
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Source/sink matrix beyond parquet (SURVEY §2.1): CSV, JSON and ORC
  * round-trips over the real documents table — schema enforced on read (no
  * silent inference drift), values bit-equal after the round trip, and ORC
  * keeps predicate pushdown at the scan. binaryFile and text sources are
  * exercised by PdfTextSpec/PipelineSpec; parquet by everything. */
class SourcesSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  private def docs = spark.read.parquet(s"$sf/documents.parquet")

  private def tmp(tag: String): String =
    Files.createTempDirectory(s"graft-src-$tag").toString

  private def sortedRows(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.orderBy("doc_id").collect().map(_.mkString("")).toSeq

  test("json round trip preserves every row and column") {
    val dir = tmp("json")
    docs.write.mode("overwrite").json(dir)
    val back = spark.read.schema(docs.schema).json(dir)
    assert(back.schema === docs.schema)
    assert(sortedRows(back) === sortedRows(docs))
  }

  test("csv round trip with header + quoting preserves free text") {
    val dir = tmp("csv")
    // text contains spaces and may contain the delimiter — default quoting
    // must protect it
    docs.write.mode("overwrite").option("header", "true").csv(dir)
    val back = spark.read.schema(docs.schema).option("header", "true").csv(dir)
    assert(sortedRows(back) === sortedRows(docs))
  }

  test("orc round trip preserves rows; filter pushes down to the orc scan") {
    val dir = tmp("orc")
    docs.write.mode("overwrite").orc(dir)
    val back = spark.read.schema(docs.schema).orc(dir)
    assert(sortedRows(back) === sortedRows(docs))
    val p = back.filter(col("doc_id") === 42L)
      .queryExecution.explainString(FormattedMode)
    assert(p.contains("PushedFilters") && p.contains("EqualTo(doc_id,42)"),
      s"doc_id filter not pushed into the ORC scan:\n$p")
  }

  test("partitioned parquet sink prunes partitions on read") {
    val dir = tmp("part")
    docs.withColumn("part_lang", coalesce(col("lang"), lit("und")))
      .write.mode("overwrite").partitionBy("part_lang").parquet(dir)
    val back = spark.read.parquet(dir).filter(col("part_lang") === "en")
    val p = back.queryExecution.explainString(FormattedMode)
    assert(p.contains("PartitionFilters") &&
      p.contains("part_lang") && !p.contains("PartitionFilters: []"),
      s"partition filter did not prune:\n$p")
    assert(back.count() === docs.filter(col("lang") === "en").count())
  }

  test("schema evolution: mergeSchema unifies snapshots, old rows null-fill " +
    "the new column, pushdown survives") {
    val dir = tmp("evolve")
    // snapshot 1: original schema; snapshot 2 adds a quality score column
    docs.select("doc_id", "text", "lang")
      .write.mode("overwrite").parquet(s"$dir/s=1")
    docs.select(col("doc_id") + 1000000L as "doc_id", col("text"), col("lang"),
        (col("n_chars") % 100).as("quality"))
      .write.mode("overwrite").parquet(s"$dir/s=2")
    val back = spark.read.option("mergeSchema", "true").parquet(dir)
    assert(back.columns.toSet == Set("doc_id", "text", "lang", "quality", "s"))
    val n = docs.count()
    assert(back.count() == 2 * n)
    assert(back.filter(col("quality").isNull).count() == n,
      "pre-evolution rows must read the new column as NULL")
    assert(back.filter(col("quality").isNotNull).count() == n)
    val p = back.filter(col("doc_id") === 42L)
      .queryExecution.explainString(FormattedMode)
    assert(p.contains("EqualTo(doc_id,42)"),
      s"pushdown must survive the merged schema:\n$p")
  }

  test("dynamic partition overwrite replaces only the touched partition") {
    val dir = tmp("dynover")
    val base = docs.withColumn("part_lang", coalesce(col("lang"), lit("und")))
    base.write.mode("overwrite").partitionBy("part_lang").parquet(dir)
    val before = spark.read.parquet(dir)
    val nOther = before.filter(col("part_lang") =!= "en").count()
    // rewrite ONLY the en partition with doc_ids shifted — static overwrite
    // mode would wipe the other partitions
    base.filter(col("part_lang") === "en")
      .withColumn("doc_id", col("doc_id") + 5000000L)
      .write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("part_lang").parquet(dir)
    val after = spark.read.parquet(dir)
    assert(after.filter(col("part_lang") =!= "en").count() == nOther,
      "untouched partitions must survive a dynamic overwrite")
    assert(after.filter(col("part_lang") === "en")
      .agg(min(col("doc_id"))).collect()(0).getLong(0) >= 5000000L,
      "the en partition must hold only the rewritten rows")
  }
}
