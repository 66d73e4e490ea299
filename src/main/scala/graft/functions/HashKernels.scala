package graft.functions

import java.security.MessageDigest
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.unsafe.types.UTF8String
import graft.ext.TextOps

/** Static kernels behind the native hash expressions — called directly from
  * generated code, so they must be plain JVM statics with no Spark state.
  *
  * Contract: [[hash32]] returns EXACTLY the value of the SQL expression
  * `CAST(conv(substring(md5(s), 1, 8), 16, 10) AS BIGINT)` — i.e. the first
  * 4 md5 digest bytes read as an unsigned big-endian 32-bit integer — which
  * is also what the DuckDB oracle computes. FunctionSpec pins the parity.
  */
object HashKernels {

  private val md5Local = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest = MessageDigest.getInstance("MD5")
  }

  /** First 4 md5 bytes of the string's UTF-8 encoding, as unsigned 32-bit. */
  def hash32(s: UTF8String): Long = {
    val md = md5Local.get()
    md.reset()
    val d = md.digest(s.getBytes)
    ((d(0) & 0xFFL) << 24) | ((d(1) & 0xFFL) << 16) |
      ((d(2) & 0xFFL) << 8) | (d(3) & 0xFFL)
  }

  /** One-pass 8-value MinHash signature over a string array: each element is
    * md5-hashed ONCE and all 8 permutation minima update together (the
    * HOF formulation rehashes the array once per permutation and boxes every
    * intermediate). Empty input ⇒ all-null signature, matching
    * `array_min(transform(empty, …))`. */
  def minhash8(arr: ArrayData): ArrayData = {
    val n = arr.numElements()
    val a = TextOps.MinHashA
    val b = TextOps.MinHashB
    val p = TextOps.MinHashP
    if (n == 0) return new GenericArrayData(Array.fill[Any](a.length)(null))
    val mins = Array.fill(a.length)(Long.MaxValue)
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val h = hash32(arr.getUTF8String(i))
        var j = 0
        while (j < mins.length) {
          val v = (a(j) * h + b(j)) % p
          if (v < mins(j)) mins(j) = v
          j += 1
        }
      }
      i += 1
    }
    if (mins(0) == Long.MaxValue) // only-null elements behave like empty
      new GenericArrayData(Array.fill[Any](a.length)(null))
    else new GenericArrayData(mins.map(Long.box(_): Any))
  }

  /** One-pass 16-bit SimHash over a string array: each element md5-hashed
    * once, all 16 bit-counters updated together. Value-equal to
    * TextOps.simhash16Hof (the HOF fold formulation): empty input ⇒ all
    * counters 0 ⇒ every bit set (0 >= 0) ⇒ 0xFFFF; a null element makes the
    * HOF accumulator null, so return null for parity. */
  def simhash16(arr: ArrayData): Any = {
    val n = arr.numElements()
    val sums = new Array[Long](16)
    var i = 0
    while (i < n) {
      if (arr.isNullAt(i)) return null
      val h = hash32(arr.getUTF8String(i))
      var j = 0
      while (j < 16) {
        sums(j) += (((h >>> j) & 1L) * 2L - 1L)
        j += 1
      }
      i += 1
    }
    var fp = 0L
    var j = 0
    while (j < 16) { if (sums(j) >= 0) fp |= (1L << j); j += 1 }
    fp
  }

  private val Space = UTF8String.fromString(" ")

  /** Distinct 3-word shingles in first-occurrence order — value-equal to
    * `array_distinct(transform(sequence(1, n-2), i ->
    * concat_ws(' ', w[i], w[i+1], w[i+2])))` and to DuckDB's
    * `list_distinct(list_transform(...))`: fewer than 3 tokens ⇒ empty,
    * null elements skipped by the join exactly like concat_ws. One pass,
    * no boxed lambda dispatch, no per-position sequence array. */
  def shingles3(arr: ArrayData): ArrayData = {
    val n = arr.numElements()
    if (n < 3) return new GenericArrayData(Array.empty[Any])
    val seen = new java.util.LinkedHashSet[UTF8String]()
    def at(i: Int): UTF8String = if (arr.isNullAt(i)) null else arr.getUTF8String(i)
    var i = 0
    while (i + 2 < n) {
      seen.add(UTF8String.concatWs(Space, at(i), at(i + 1), at(i + 2)))
      i += 1
    }
    new GenericArrayData(seen.toArray(Array.empty[AnyRef]).asInstanceOf[Array[Any]])
  }

  /** ALL 3-word shingles in position order, duplicates kept — value-equal
    * to `transform(sequence(1, n-2), i -> concat_ws(' ', w[i], w[i+1],
    * w[i+2]))` (the tf-with-multiplicity generator of x47); fewer than 3
    * tokens ⇒ empty. The non-deduping twin of [[shingles3]]. */
  def shingles3All(arr: ArrayData): ArrayData = {
    val n = arr.numElements()
    if (n < 3) return new GenericArrayData(Array.empty[Any])
    def at(i: Int): UTF8String = if (arr.isNullAt(i)) null else arr.getUTF8String(i)
    val out = new Array[Any](n - 2)
    var i = 0
    while (i + 2 < n) {
      out(i) = UTF8String.concatWs(Space, at(i), at(i + 1), at(i + 2))
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Distinct n-grams (space-joined, first-occurrence order) — the
    * parametric twin of [[shingles3]]: fewer than n tokens ⇒ empty. Emits
    * the SET per document, so a consumer that explodes it needs no
    * row-level distinct afterwards (x41 drops a full shuffle this way). */
  def ngramsDistinct(arr: ArrayData, ng: Int): ArrayData = {
    val n = arr.numElements()
    if (n < ng) return new GenericArrayData(Array.empty[Any])
    val seen = new java.util.LinkedHashSet[UTF8String]()
    val win = new Array[UTF8String](ng)
    var i = 0
    while (i + ng - 1 < n) {
      var j = 0
      while (j < ng) {
        win(j) = if (arr.isNullAt(i + j)) null else arr.getUTF8String(i + j)
        j += 1
      }
      seen.add(UTF8String.concatWs(Space, win: _*))
      i += 1
    }
    new GenericArrayData(seen.toArray(Array.empty[AnyRef]).asInstanceOf[Array[Any]])
  }

  /** All unordered distinct-token pairs "a b" (binary-ascending, a < b) —
    * value-equal to the HOF chain `flatten(transform(sort_array(
    * array_distinct(w)), (x,i) -> transform(slice(...), y -> concat(x,' ',y))))`
    * and to the oracle's within-doc self-join on `a.tok < b.tok`. One pass
    * dedup+sort via TreeSet (UTF8String.compareTo = Spark's binary string
    * order), then a tight pair loop — no boxed lambda dispatch, no
    * intermediate arrays. Null tokens are skipped (the tokenizer never
    * produces them). */
  def cooccurPairs(arr: ArrayData): ArrayData = {
    val n = arr.numElements()
    val set = new java.util.TreeSet[UTF8String]()
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) set.add(arr.getUTF8String(i))
      i += 1
    }
    val toks = set.toArray(Array.empty[AnyRef])
    val m = toks.length
    val out = new Array[Any](m * (m - 1) / 2)
    var k = 0
    var a = 0
    while (a < m) {
      var b = a + 1
      while (b < m) {
        out(k) = UTF8String.concatWs(Space,
          toks(a).asInstanceOf[UTF8String], toks(b).asInstanceOf[UTF8String])
        k += 1
        b += 1
      }
      a += 1
    }
    new GenericArrayData(out)
  }

  /** First 6 md5 bytes as unsigned 48-bit — the value of DuckDB's
    * `CAST(concat('0x', substr(md5(s),1,12)) AS BIGINT)`. The wider twin of
    * [[hash32]] for fingerprints where 16/32 bits collide too much. */
  def hash48(s: UTF8String): Long = {
    val md = md5Local.get()
    md.reset()
    val d = md.digest(s.getBytes)
    ((d(0) & 0xFFL) << 40) | ((d(1) & 0xFFL) << 32) | ((d(2) & 0xFFL) << 24) |
      ((d(3) & 0xFFL) << 16) | ((d(4) & 0xFFL) << 8) | (d(5) & 0xFFL)
  }

  /** 48-bit SimHash — [[simhash16]] widened (48 counters over [[hash48]]
    * bits). 16 bits saturate on a shared-vocabulary corpus (real duplicate
    * groups all land at Hamming 0 together with unrelated docs); 48 bits
    * keep the Hamming histogram spread while still fitting a positive
    * BIGINT on both engines. Same null/empty contract as simhash16. */
  def simhash48(arr: ArrayData): Any = {
    val n = arr.numElements()
    val sums = new Array[Long](48)
    var i = 0
    while (i < n) {
      if (arr.isNullAt(i)) return null
      val h = hash48(arr.getUTF8String(i))
      var j = 0
      while (j < 48) {
        sums(j) += (((h >>> j) & 1L) * 2L - 1L)
        j += 1
      }
      i += 1
    }
    var fp = 0L
    var j = 0
    while (j < 48) { if (sums(j) >= 0) fp |= (1L << j); j += 1 }
    fp
  }

  /** Strictly-sequential (ascending index) double dot product — the exact
    * IEEE operation order of `aggregate(zip_with(a,b,_*_), 0.0, _+_)` and of
    * the DuckDB oracle's `list_reduce(list_prepend(0.0, …))`, so results are
    * bit-identical across all three forms. */
  def dotSeq(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) { acc += a.getDouble(i) * b.getDouble(i); i += 1 }
    acc
  }

  /** Exact integer squared distance over two array<long> columns (the
    * x137/x143 quantization: 64 dims in [0, 2000] ⇒ Σ diff² ≤ 2.56e8 —
    * no overflow). Integer adds are associative, so any order matches the
    * HOF fold and the oracle's list_reduce exactly; this kernel exists to
    * skip the per-element boxing on the graph-construction hot path.
    *
    * Returns null (boxed) when the arrays differ in length or either
    * contains a null element — the exact semantics of the HOF fold
    * `aggregate(zip_with(a, b, (x,y) => (x-y)*(x-y)), 0L, _+_)`:
    * zip_with pads the shorter array with nulls and `acc + null` nulls
    * the whole fold. graft_idist2 is a registered session SQL function,
    * so arbitrary user arrays can reach this; an unchecked min-length
    * loop would silently read nulls as undefined values. On the x143 hot
    * path (equal-length, non-null quantized vectors) the null probe is
    * one bitmap-word read per element — negligible next to the multiply. */
  def idist2Checked(a: ArrayData, b: ArrayData): java.lang.Long = {
    val n = a.numElements()
    if (n != b.numElements()) return null
    var acc = 0L
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val d = a.getLong(i) - b.getLong(i)
      acc += d * d
      i += 1
    }
    java.lang.Long.valueOf(acc)
  }

  /** ALL character n-grams for n = 1..maxN in (n asc, position asc)
    * order, duplicates kept — value-equal (as a multiset; downstream is
    * a groupBy count) to the chrF HOF pyramid
    * `flatten(transform(sequence(1, maxN), n -> transform(..., i ->
    * substring(t, i, n))))`. One pass computes the codepoint byte
    * offsets, then every gram is a zero-walk `fromBytes` slice — the
    * HOF's substring(t, i, n) re-walks the string per gram (O(len) each,
    * O(len²·maxN) per doc) on top of the interpreted lambda dispatch. */
  def charGrams(t: UTF8String, maxN: Int): ArrayData = {
    val bytes = t.getBytes
    val nb = bytes.length
    // one UTF-8 walk; nb + 1 is an upper bound on codepoint starts
    val off = new Array[Int](nb + 1)
    var count = 0
    var p = 0
    while (p < nb) {
      off(count) = p
      p += UTF8String.numBytesForFirstByte(bytes(p)); count += 1
    }
    off(count) = nb
    var total = 0
    var n = 1
    while (n <= maxN) { if (count >= n) total += count - n + 1; n += 1 }
    val out = new Array[Any](total)
    var k = 0
    n = 1
    while (n <= maxN) {
      var i = 0
      while (i + n <= count) {
        out(k) = UTF8String.fromBytes(bytes, off(i), off(i + n) - off(i))
        k += 1; i += 1
      }
      n += 1
    }
    new GenericArrayData(out)
  }

  /** ALL word n-grams for n = 1..maxN in (n asc, position asc) order,
    * duplicates kept, each emitted as ONE flat string: a leading order
    * digit ('0'+n) followed by the space-joined tokens — value-equal (as
    * a multiset, after stripping the digit) to the BLEU HOF pyramid
    * `flatten(transform(sequence(1, maxN), n -> transform(..., i ->
    * array_join(slice(w, i, n), ' '))))`. The digit makes the gram's
    * order recoverable as `ascii(g) - 48` and the md5 key as
    * `md5(substring(g, 2))` — two codegen'd ops — while the HOF pays a
    * named_struct per gram plus interpreted lambda dispatch per
    * position (the GraftCharGrams finding, word-gram edition). Token
    * bytes are fetched once; each gram is one exact-size byte
    * assembly. split() output never holds nulls, but a null element
    * (possible through the declared array<string> type) is skipped
    * inside its window exactly like array_join skips it — the HOF
    * twin's semantics, same as the sibling kernels' isNullAt guards. */
  def wordGramsAll(w: ArrayData, maxN: Int): ArrayData = {
    val count = w.numElements()
    val toks = new Array[Array[Byte]](count)
    var i = 0
    while (i < count) {
      toks(i) = if (w.isNullAt(i)) null else w.getUTF8String(i).getBytes
      i += 1
    }
    var total = 0
    var n = 1
    while (n <= maxN) { if (count >= n) total += count - n + 1; n += 1 }
    val out = new Array[Any](total)
    var k = 0
    n = 1
    while (n <= maxN) {
      i = 0
      while (i + n <= count) {
        var len = 1 // prefix digit
        var live = 0 // non-null tokens in the window
        var j = 0
        while (j < n) {
          val t = toks(i + j)
          if (t != null) { len += t.length; live += 1 }
          j += 1
        }
        if (live > 1) len += live - 1 // separators between live tokens
        val b = new Array[Byte](len)
        b(0) = ('0' + n).toByte
        var p = 1
        var emitted = 0
        j = 0
        while (j < n) {
          val t = toks(i + j)
          if (t != null) {
            if (emitted > 0) { b(p) = ' '; p += 1 }
            System.arraycopy(t, 0, b, p, t.length); p += t.length
            emitted += 1
          }
          j += 1
        }
        out(k) = UTF8String.fromBytes(b)
        k += 1; i += 1
      }
      n += 1
    }
    new GenericArrayData(out)
  }

  /** |a ∩ b| for two SORTED, duplicate-free long arrays via a linear merge —
    * set-equal to `size(array_intersect(a, b))` but with no hash set and no
    * boxing (the near-dup verify join calls this once per candidate pair). */
  def sortedIntersectCard(a: ArrayData, b: ArrayData): Int = {
    val na = a.numElements()
    val nb = b.numElements()
    var i = 0
    var j = 0
    var n = 0
    while (i < na && j < nb) {
      val x = a.getLong(i)
      val y = b.getLong(j)
      if (x == y) { n += 1; i += 1; j += 1 }
      else if (x < y) i += 1
      else j += 1
    }
    n
  }

  /** Jaro match/transposition kernel over two strings (codepoints —
    * same index space as the SQL fold's substr/ascii spelling): greedy
    * first-unused in-window matching (w = max(max(la,lb)/2 − 1, 0)),
    * then k = mismatches between the two matched subsequences in
    * position order (transpositions t = k/2). Returns (m << 32) | k —
    * 32 bits each, safe for ANY string lengths (the expression is
    * SQL-registered, so callers are not bounded by the x174 catalog's
    * 62-char guard); 0 when either side is empty or nothing matches.
    * Value-identical to the interpreted HOF fold in queries/Ext53
    * (parity spec-pinned). */
  def jaroMk(a: UTF8String, b: UTF8String): Long = {
    val sa = a.toString.codePoints().toArray
    val sb = b.toString.codePoints().toArray
    val la = sa.length; val lb = sb.length
    if (la == 0 || lb == 0) return 0L
    val w = math.max(math.max(la, lb) / 2 - 1, 0)
    val used = new Array[Boolean](lb)
    val mi = new Array[Int](math.min(la, lb))
    var m = 0
    var i = 0
    while (i < la) {
      val lo = math.max(0, i - w); val hi = math.min(lb - 1, i + w)
      var j = lo
      var done = false
      while (j <= hi && !done) {
        if (!used(j) && sb(j) == sa(i)) {
          used(j) = true; mi(m) = i; m += 1; done = true
        }
        j += 1
      }
      i += 1
    }
    if (m == 0) return 0L
    var k = 0L; var t = 0; var j2 = 0
    while (t < m) {
      while (!used(j2)) j2 += 1
      if (sb(j2) != sa(mi(t))) k += 1
      j2 += 1; t += 1
    }
    (m.toLong << 32) | k
  }
}
