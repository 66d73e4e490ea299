package graft.ext

import java.nio.charset.StandardCharsets
import java.security.MessageDigest

/** Random-hyperplane LSH for embedding ANN (SURVEY §2.12 X3): the
  * LSH-bucketed scale path beside the IVF posting-list one (x7).
  *
  * The hyperplanes are Rademacher vectors (components ±1) derived
  * deterministically from md5("p:j") — no RNG state, so the exact same
  * matrix is BAKED into both the Spark plan and the DuckDB oracle SQL as
  * literal arrays; the two engines cannot diverge. Sign-random projections
  * approximate angular similarity: P planes give a 2^P-bucket code whose
  * collision probability is (1 - θ/π)^P (Charikar, STOC'02).
  */
object Lsh {

  /** Number of hyperplanes → 2^Planes buckets. 4 keeps buckets populated at
    * test SFs; a 100 TB deployment raises it (and multi-probes) freely —
    * the plan shape (equi-join on the bucket code) is unchanged. */
  val Planes = 4

  /** Embedding dimensionality of the driver's `embeddings` table. */
  val Dim = 64

  /** signs(p)(j) = +1.0 or −1.0 from the parity of the first md5 byte. */
  val signs: IndexedSeq[IndexedSeq[Double]] = {
    val md = MessageDigest.getInstance("MD5")
    IndexedSeq.tabulate(Planes, Dim) { (p, j) =>
      md.reset()
      val h = md.digest(s"$p:$j".getBytes(StandardCharsets.US_ASCII))
      if ((h(0) & 1) == 0) 1.0 else -1.0
    }
  }

  /** One DuckDB list literal per plane, e.g. `[1.0, -1.0, …]`. */
  def planeSqlList(p: Int): String =
    signs(p).map(v => if (v > 0) "1.0" else "-1.0").mkString("[", ", ", "]")
}
