package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Scale sanity for x148 longest-repeated-span: 100k documents that all
  * share an 18-token boilerplate prefix followed by unique tokens — the
  * realistic "duplicated boilerplate" shape. The binary search probes
  * mids 20, 10, 15, 17, 18, 19 (then fixpoint): the sub-18 probes
  * aggregate span keys with ~100k occurrences each (the hot-key path —
  * partial map-side aggregation must absorb them; there is no pair
  * join anywhere to blow up), and the answer is closed-form: the
  * boilerplate itself, length 18, once per document. */
class Ext45ScaleSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  test("x148: 100k docs sharing an 18-token boilerplate — finds exactly " +
    "that span (n_occ = n_docs = 100k) through hot-key probe rounds") {
    val dir = new java.io.File(
      sys.props("java.io.tmpdir"), s"graft_x148_scale_${System.nanoTime()}")
    try {
      val n = 100000L
      spark.range(n).select(col("id").as("doc_id"),
          concat_ws(" ",
            expr("concat_ws(' ', transform(sequence(0, 17), j -> concat('b', j)))"),
            expr("concat_ws(' ', transform(sequence(0, 21), j -> concat('u', id, '_', j)))"))
            .as("text"))
        .write.mode("overwrite").parquet(s"$dir/documents.parquet")
      val t0 = System.nanoTime()
      val out = SparkEntry.queries("x148_longest_repeat")(spark, dir.toString)
        .collect()
      val secs = (System.nanoTime() - t0) / 1e9
      info(f"x148 over 100k x 40-token docs: $secs%.1f s")
      assert(out.length == 1, s"expected exactly the boilerplate: ${out.toSeq}")
      val r = out.head
      assert(r.getAs[Long]("span_len") == 18L)
      assert(r.getAs[Long]("n_occ") == n)
      assert(r.getAs[Long]("n_docs") == n)
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest((0 to 17).map(j => s"b$j").mkString(" ").getBytes("UTF-8"))
        .map(b => f"${b & 0xff}%02x").mkString
      assert(r.getAs[String]("span_hash") == md)
    } finally {
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) f.listFiles().foreach(rm)
        f.delete()
      }
      rm(dir)
      GraftCaches.releasePrior()
    }
  }
}
