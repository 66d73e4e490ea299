package graft.ext

import java.nio.charset.StandardCharsets
import java.security.MessageDigest

/** Product-quantization codebook (SURVEY §2.12 X3 — the compression side
  * of similarity search): the 64-dim embedding splits into M=4 contiguous
  * subspaces of 16 dims; each subspace has Kc=4 codewords, and a vector's
  * PQ code is the tuple of nearest-codeword ids (argmax dot per subspace,
  * ties to the lowest id — same rule as IvfCentroids' Voronoi assignment).
  *
  * Codewords are Rademacher ±1 vectors derived deterministically from
  * md5("pq:m:k:j") and BAKED as literals into both the Spark plan and the
  * DuckDB oracle (the ext/Lsh / IvfCentroids convention). A production
  * deployment trains them per-subspace with k-means (x37 is exactly that
  * update step); the plan shape — M scan-local argmax projections, then a
  * partial-aggregable histogram — is identical either way, and is what
  * makes PQ work at 100 TB: 64 floats (256 B) become M small ints
  * (≤ 4 B), so a billion-vector index fits in executor memory.
  */
object PqCodebook {

  /** Subspace count (code length). */
  val M = 4

  /** Dims per subspace (M * SubDim = embedding dim 64). */
  val SubDim = 16

  /** Codewords per subspace (2 bits per code element here; production
    * uses 256 — the argmax structure is unchanged). */
  val Kc = 4

  /** cw(m)(k)(j) = ±1.0 from the parity of the first md5 byte of
    * "pq:m:k:j". */
  val cw: IndexedSeq[IndexedSeq[IndexedSeq[Double]]] = {
    val md = MessageDigest.getInstance("MD5")
    IndexedSeq.tabulate(M, Kc, SubDim) { (m, k, j) =>
      md.reset()
      val h = md.digest(s"pq:$m:$k:$j".getBytes(StandardCharsets.US_ASCII))
      if ((h(0) & 1) == 0) 1.0 else -1.0
    }
  }

  /** One DuckDB list literal per (subspace, codeword). */
  def cwSqlList(m: Int, k: Int): String =
    cw(m)(k).map(v => if (v > 0) "1.0" else "-1.0").mkString("[", ", ", "]")
}
