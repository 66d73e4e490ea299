package graft.ext

import java.nio.charset.StandardCharsets
import java.security.MessageDigest

/** IVF coarse quantizer anchors (SURVEY §2.12 X3): x23 partitions the
  * corpus by NEAREST anchor direction (argmax dot — a Voronoi cell per
  * anchor), the true inverted-file structure, vs x7's pre-existing label
  * column and x16's LSH sign-codes. Anchors are Rademacher vectors derived
  * deterministically from md5("c:k:j") — same norm √Dim each, so argmax
  * dot ≡ argmax cosine — and are BAKED as literals into both the Spark
  * plan and the DuckDB oracle, like ext/Lsh. A real deployment would train
  * them with k-means; the plan shape (per-row assignment + equi-join on
  * the cell id) is identical either way.
  */
object IvfCentroids {

  /** Anchor count → Voronoi cells. 4 keeps cells populated at test SFs; a
    * 100 TB deployment raises K (and adds multi-probe) freely. */
  val K = 4

  /** Embedding dimensionality of the driver's `embeddings` table. */
  val Dim = 64

  /** c(k)(j) = ±1.0 from the parity of the first md5 byte of "c:k:j". */
  val c: IndexedSeq[IndexedSeq[Double]] = {
    val md = MessageDigest.getInstance("MD5")
    IndexedSeq.tabulate(K, Dim) { (k, j) =>
      md.reset()
      val h = md.digest(s"c:$k:$j".getBytes(StandardCharsets.US_ASCII))
      if ((h(0) & 1) == 0) 1.0 else -1.0
    }
  }

  /** One DuckDB list literal per anchor. */
  def anchorSqlList(k: Int): String =
    c(k).map(v => if (v > 0) "1.0" else "-1.0").mkString("[", ", ", "]")
}
