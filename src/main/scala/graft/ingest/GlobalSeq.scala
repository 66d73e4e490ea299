package graft.ingest

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** Scale-safe global sequencing: append a dense 0-based `seqCol` following
  * `sortCols` order WITHOUT a single-partition window.
  *
  * Plan: range-sort on the keys (Spark's range partitioner keeps partition i
  * strictly before partition i+1 in sort order), then `zipWithIndex` — which
  * runs one O(P) job collecting per-partition counts to the driver and adds
  * each partition's offset locally. Data never funnels through one task; only
  * P longs cross the driver. This is the same boundary-exchange shape as
  * enrich/BoundaryFill (SURVEY H1 feed-order semantics at cluster scale).
  */
object GlobalSeq {

  def withSeq(df: DataFrame, sortCols: Seq[Column], seqCol: String): DataFrame = {
    val sorted = df.orderBy(sortCols: _*)
    val schema = StructType(
      sorted.schema.fields :+ StructField(seqCol, LongType, nullable = false))
    val rdd = sorted.rdd.zipWithIndex().map { case (r, i) => Row.fromSeq(r.toSeq :+ i) }
    sorted.sparkSession.createDataFrame(rdd, schema)
  }
}
