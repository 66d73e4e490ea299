package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.ext.TextOps
import graft.tables.Tables._

/** Dev diagnostic: candidate-pair count for x4_ngram_jaccard with and
  * without the PPJoin positional filter (run:
  * `sbt "Test/runMain graft.X4Candidates /root/testdata/sf0.1"`). */
object X4Candidates {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = TestSpark.spark
    spark.sparkContext.setLogLevel("WARN")
    val t = 0.6
    val w = TextOps.words(col("text"))
    val sh = documents(spark, d).repartition(col("doc_id"))
      .select(col("doc_id"), w.as("w"))
      .withColumn("ss", TextOps.shingles3(col("w")))
      .select(col("doc_id"), explode(col("ss")).as("shingle"),
        size(col("ss")).as("n"))
    val df = sh.groupBy(col("shingle")).agg(count(lit(1)).as("df"))
    val ranked = sh.join(df, Seq("shingle"))
      .withColumn("pos", row_number().over(
        Window.partitionBy(col("doc_id")).orderBy(col("df"), col("shingle"))))
    val prefix = ranked.filter(col("pos") <= col("n") - ceil(col("n") * t) + 1)
      .select(col("doc_id"), col("n"), col("pos"), col("shingle"))
      .persist()
    val lengthOnly = prefix.as("a").join(prefix.as("b"),
        col("a.shingle") === col("b.shingle") && col("a.doc_id") < col("b.doc_id") &&
          col("b.n") >= ceil(col("a.n") * t) && col("a.n") >= ceil(col("b.n") * t))
      .select(col("a.doc_id"), col("b.doc_id")).distinct().count()
    val positional = prefix.as("a").join(prefix.as("b"),
        col("a.shingle") === col("b.shingle") && col("a.doc_id") < col("b.doc_id") &&
          col("b.n") >= ceil(col("a.n") * t) && col("a.n") >= ceil(col("b.n") * t) &&
          least(col("a.n") - col("a.pos"), col("b.n") - col("b.pos")) + 1 >=
            ceil((col("a.n") + col("b.n")) * (t / (1 + t))))
      .select(col("a.doc_id"), col("b.doc_id")).distinct().count()
    println(s"X4CAND length_only=$lengthOnly positional=$positional " +
      f"pruned=${100.0 * (lengthOnly - positional) / math.max(lengthOnly, 1)}%.1f%%")
  }
}
