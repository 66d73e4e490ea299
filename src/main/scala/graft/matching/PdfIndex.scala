package graft.matching

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.norm.Normalize

/** J1 build side: PDF chunks → (key → rem2) match index
  * (SURVEY §2.4-J1, main.py:421–522).
  *
  * Each chunk parses once (UDF line scanner), then fans out into its 3 name
  * variants; collisions resolve **first chunk wins, per variant
  * independently** (`min_by` on chunk_seq — the reference inserts each
  * variant with `not in mapping` over os.listdir order; we normalize the
  * order to chunk_seq, SURVEY H5).
  *
  * The result is O(chunks) rows — always broadcast at the probe join.
  */
object PdfIndex {

  private val parseChunkUdf = udf((s: String) => PdfParse.parseChunk(s))

  /** chunks: (chunk_seq, chunk) → index: (key, rem2). */
  def build(chunks: DataFrame): DataFrame = {
    chunks
      .select(col("chunk_seq"), parseChunkUdf(col("chunk")).as("info"))
      .filter(col("info.name").isNotNull)
      .select(col("chunk_seq"), col("info.rem2").as("rem2"),
        explode(Normalize.variantsArray(col("info.name"))).as("key"))
      .filter(col("key") =!= "")
      .groupBy(col("key"))
      .agg(min_by(col("rem2"), col("chunk_seq")).as("rem2"))
  }
}
