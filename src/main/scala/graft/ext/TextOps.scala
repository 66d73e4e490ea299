package graft.ext

import org.apache.spark.sql.{Column, GraftColumnBridge => B}
import org.apache.spark.sql.functions._
import graft.functions.{GraftHash32, GraftMinHash8, GraftShingles3, GraftSimHash16, GraftSimHash48, SortedIntersectCard}

/** Column-level primitives for the LLM-data-pipeline extension operators
  * (SURVEY §2.12): cross-engine-deterministic hashing, shingling, MinHash,
  * SimHash, and fingerprinting over a text column.
  *
  * Everything here is a pure Catalyst expression tree (no UDFs): per-row
  * array work stays inside whole-stage codegen and needs no shuffle, so the
  * cost at 100 TB is a single scan. The only hash primitive is md5 —
  * available bit-identically in Spark, DuckDB, and every other engine — so
  * the DuckDB oracle can replay the exact same signatures.
  */
object TextOps {

  /** Large prime modulus for MinHash permutations (2^31 - 1). */
  val MinHashP = 2147483647L
  /** Fingerprint modulus (1e9 + 7). */
  val FpMod = 1000000007L
  /** MinHash permutation params: mh_j(x) = (A(j)*x + B(j)) mod P. */
  val MinHashA: Seq[Long] = Seq(7L, 11L, 13L, 17L, 19L, 23L, 29L, 31L)
  val MinHashB: Seq[Long] = Seq(3L, 5L, 7L, 11L, 13L, 17L, 19L, 23L)

  /** Deterministic 32-bit string hash shared with the oracle: the first 8 hex
    * digits of md5, as a long in [0, 2^32). DuckDB spelling:
    * `CAST(concat('0x', substr(md5(s),1,8)) AS BIGINT)`. Routed through the
    * native graft_hash32 expression (functions/GraftHash32) — digest bytes
    * straight to long, no hex round-trip; value-equal to the SQL form
    * (parity pinned in FunctionSpec). Constructed directly (not via the
    * function registry), so it resolves in sessions without the
    * GraftExtensions injection. */
  def hash32(c: Column): Column = B.column(GraftHash32(B.expression(c)))

  /** The pure-SQL spelling of [[hash32]] — kept for parity testing. */
  def hash32Sql(c: Column): Column =
    conv(substring(md5(c.cast("binary")), 1, 8), 16, 10).cast("long")

  /** 8-value MinHash signature via the native one-pass expression. */
  def minhashSig(shingles: Column): Column =
    B.column(GraftMinHash8(B.expression(shingles)))

  /** Whitespace tokens. */
  def words(text: Column): Column = split(text, " ")

  /** Distinct 3-word shingles (1-based positions, matching DuckDB list
    * indexing); fewer than 3 tokens ⇒ empty set. Native one-pass
    * expression (registry-free); [[shingles3Hof]] is the HOF twin kept for
    * parity testing. The coalesce pins NULL-input behavior to the HOF/
    * oracle contract (null token array ⇒ empty set, not NULL — the
    * CASE/WHEN twins never produce NULL). */
  def shingles3(w: Column): Column =
    coalesce(B.column(GraftShingles3(B.expression(w))),
      typedLit(Seq.empty[String]))

  /** HOF formulation of [[shingles3]] — runs interpreted (array HOFs don't
    * codegen); parity pinned in FunctionSpec. */
  def shingles3Hof(w: Column): Column =
    when(size(w) >= 3,
      array_distinct(transform(sequence(lit(1), size(w) - 2), i =>
        concat_ws(" ", element_at(w, i), element_at(w, i + 1), element_at(w, i + 2)))))
      .otherwise(array().cast("array<string>"))

  /** ALL 3-shingles with multiplicity (position order) — the x47 tf
    * generator as one native codegen'd pass. */
  def shingles3All(w: Column): Column =
    B.column(graft.functions.GraftShingles3All(B.expression(w)))

  /** Distinct n-grams (space-joined) as one native codegen'd pass; the
    * emitted array is already a set, so explode + groupBy needs no
    * row-level distinct. */
  def ngramsDistinct(w: Column, n: Int): Column =
    B.column(graft.functions.GraftNgrams(B.expression(w), n))

  /** All character 1..maxN-grams with multiplicity as one native
    * codegen'd pass (x155's gram generator; order = length(gram)). */
  def charGrams(text: Column, maxN: Int): Column =
    B.column(graft.functions.GraftCharGrams(B.expression(text), maxN))

  /** All word 1..maxN-grams with multiplicity as one native codegen'd
    * pass, each gram prefixed with its order digit (the BLEU-family
    * generator — x152/x171); decode with [[gramOrder]]/[[gramKey]]. */
  def wordGramsAll(w: Column, maxN: Int): Column =
    B.column(graft.functions.GraftWordGrams(B.expression(w), maxN))

  /** The order n of one exploded [[wordGramsAll]] gram (its prefix
    * digit). */
  def gramOrder(pg: Column): Column = (ascii(pg) - 48).cast("long")

  /** The md5 join key of one exploded [[wordGramsAll]] gram — equal to
    * the HOF pyramid's md5(array_join(slice(w, i, n), ' ')). */
  def gramKey(pg: Column): Column =
    md5(substring(pg, 2, Int.MaxValue).cast("binary"))

  /** All unordered distinct-token pairs "a b" (a < b, binary order) — the
    * x51 co-occurrence generator as one native codegen'd pass. */
  def cooccurPairs(tokens: Column): Column =
    B.column(graft.functions.GraftCooccurPairs(B.expression(tokens)))

  /** MinHash signature value j over a pre-hashed shingle array (HOF
    * formulation — the verification twin of the native signature). */
  def minhash(hashes: Column, j: Int): Column =
    array_min(transform(hashes, x => (lit(MinHashA(j)) * x + lit(MinHashB(j))) % MinHashP))

  /** LSH band keys from a [[minhashSig]] signature: bands of 2 values each,
    * tagged with the band index so different bands never collide. */
  def bandKeys(sig: Column, nBands: Int): Column =
    array((0 until nBands).map { b =>
      concat_ws("_", lit(b), element_at(sig, 2 * b + 1), element_at(sig, 2 * b + 2))
    }: _*)

  /** 16-bit SimHash over a distinct-token array: bit i of the fingerprint is
    * set iff sum over tokens of ±1 (by bit i of the token hash) is >= 0.
    * Routed through the native one-pass graft_simhash16 expression (each
    * token md5-hashed once, all 16 counters updated in generated code);
    * [[simhash16Hof]] is the interpreted HOF twin kept for parity testing.
    * Constructed directly so no session-level registration is required. */
  def simhash16(tokens: Column): Column =
    B.column(GraftSimHash16(B.expression(tokens)))

  /** 48-bit SimHash (native one-pass GraftSimHash48, registry-free): the
    * wider twin of [[simhash16]] for corpora where 16 bits saturate — bits
    * come from the first 6 md5 bytes per token (DuckDB
    * `substr(md5(s),1,12)`), so banded near-dup joins on it replay exactly. */
  def simhash48(tokens: Column): Column =
    B.column(GraftSimHash48(B.expression(tokens)))

  /** HOF-fold formulation of [[simhash16]] — single fold with a 16-long
    * array accumulator so the token array is hashed exactly once; runs
    * interpreted (array HOFs don't codegen). Parity pinned in FunctionSpec. */
  def simhash16Hof(tokens: Column): Column = {
    val hs = transform(tokens, hash32(_))
    val zeros = array((0 until 16).map(_ => lit(0L)): _*)
    val bitSums = aggregate(hs, zeros, (acc, x) =>
      transform(acc, (a, i) =>
        a + (call_function("shiftright", x, i).bitwiseAND(1) * 2 - 1)))
    val weights = array((0 until 16).map(i => lit(1L << i)): _*)
    aggregate(
      zip_with(bitSums, weights, (s, w) => when(s >= 0, w).otherwise(lit(0L))),
      lit(0L), (acc, x) => acc + x)
  }

  /** Order-sensitive polynomial fingerprint: fold (acc*31 + hash32(w)) mod
    * FpMod over the token sequence — the rolling-hash document fingerprint. */
  def polyFingerprint(w: Column): Column =
    aggregate(w, lit(0L), (acc, x) => (acc * 31 + hash32(x)) % FpMod)

  /** Exact Jaccard similarity of two pre-distinct string arrays, as a
    * DOUBLE computed from exact integer counts (deterministic bits). */
  def jaccard(a: Column, b: Column): Column = {
    val inter = size(array_intersect(a, b)).cast("double")
    inter / (size(a) + size(b) - size(array_intersect(a, b)))
  }

  /** Linear-merge |a ∩ b| over two sorted duplicate-free array<long>
    * columns (native SortedIntersectCard expression, registry-free). */
  def intersectCard(a: Column, b: Column): Column =
    B.column(SortedIntersectCard(B.expression(a), B.expression(b)))
}
