package graft.queries
import org.apache.spark.sql.functions._
object SeqDebug {
  def main(args: Array[String]): Unit = {
    val spark = graft.TestSpark.spark
    spark.sparkContext.setLogLevel("WARN")
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    for (r <- 1 to 3) {
      val t0 = System.nanoTime()
      val full = graft.SparkEntry.queries("x4_ngram_jaccard")(spark, d)
      // reach into the pipeline by reconstructing the stages (same code path)
      val t1 = System.nanoTime()
      val n = full.count()
      val t2 = System.nanoTime()
      println(f"X4 rep$r: construct ${(t1-t0)/1e9}%.2f s, count ${(t2-t1)/1e9}%.2f s (rows $n)")
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
      graft.GraftCaches.releasePrior(); System.gc()
    }
    // piecewise timing of the pipeline stages
    
    val docs = graft.tables.Tables.documents(spark, d)
    for (r <- 1 to 2) {
      val t = 0.6
      var t0 = System.nanoTime()
      val sh = Ext.docShinglesHashed(docs).persist()
      sh.count()
      val tSh = (System.nanoTime() - t0) / 1e9
      t0 = System.nanoTime()
      val inv = sh.select(col("doc_id"), size(col("hs")).as("n"), explode(col("ss")).as("shingle"))
      val freq = inv.groupBy(col("shingle")).agg(count(lit(1)).as("df"))
      val ranked = inv.join(freq, Seq("shingle"))
        .withColumn("pos", row_number().over(
          org.apache.spark.sql.expressions.Window.partitionBy(col("doc_id")).orderBy(col("df"), col("shingle"))))
      val prefix = ranked.filter(col("pos") <= col("n") - ceil(col("n") * t) + 1)
        .select(col("doc_id"), col("n"), col("pos"), col("shingle")).persist()
      val np = prefix.count()
      val tPre = (System.nanoTime() - t0) / 1e9
      t0 = System.nanoTime()
      val cand = prefix.as("a").join(prefix.as("b"),
          col("a.shingle") === col("b.shingle") && col("a.doc_id") < col("b.doc_id") &&
            col("b.n") >= ceil(col("a.n") * t) && col("a.n") >= ceil(col("b.n") * t) &&
            least(col("a.n") - col("a.pos"), col("b.n") - col("b.pos")) + 1 >=
              ceil((col("a.n") + col("b.n")) * (t / (1 + t))))
        .select(col("a.doc_id").as("id1"), col("b.doc_id").as("id2")).distinct()
      val nc = cand.count()
      val tCand = (System.nanoTime() - t0) / 1e9
      println(f"X4SPLIT rep$r: sh $tSh%.2f s, prefix $tPre%.2f s (rows $np), cand $tCand%.2f s (rows $nc)")
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
      System.gc()
    }
    spark.stop()
  }
}
