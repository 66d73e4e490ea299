package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import graft.norm.{Normalize, PyText}

/** Native strip_accents_key expression: SQL registration via
  * SparkSessionExtensions, codegen execution, byte parity with the UDF path. */
class FunctionSpec extends AnyFunSuite {

  test("registered in SQL via the session extension") {
    val spark = TestSpark.spark
    val out = spark.sql("SELECT strip_accents_key('  Crème  Brûlée ') AS k")
      .collect()(0).getString(0)
    assert(out == "creme brulee")
    assert(out == PyText.stripAccentsKey("  Crème  Brûlée "))
  }

  test("expression output is byte-identical to the UDF on unicode inputs") {
    val spark = TestSpark.spark
    import spark.implicits._
    val inputs = Seq("Crème Brûlée", "ﬁancé", "Ñoño", "ABD-AL  RAHMAN",
      "Где-то", "café au lait", "", "Ω≈ç√∫", "áé")
    val df = inputs.toDF("s")
      .select(col("s"),
        call_function("strip_accents_key", col("s")).as("native"),
        Normalize.stripAccentsUdf(col("s")).as("viaUdf"))
    val rows = df.collect()
    for (r <- rows)
      assert(r.getString(1) == r.getString(2), s"input=<${r.getString(0)}>")
  }

  test("graft_hash32 equals the SQL md5-prefix form; minhash8 equals the HOF form") {
    val spark = TestSpark.spark
    import graft.ext.TextOps
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val w = split(col("text"), " ")
    val mismatch = docs
      .select(col("doc_id"), w.as("w"))
      .select(col("doc_id"), col("w"),
        transform(col("w"), x => TextOps.hash32(x)).as("native"),
        transform(col("w"), x => TextOps.hash32Sql(x)).as("sql"))
      .filter(not(col("native") <=> col("sql")))
      .count()
    assert(mismatch == 0)

    val sigMismatch = docs
      .select(array_distinct(w).as("toks"))
      .select(TextOps.minhashSig(col("toks")).as("native"),
        array((0 until 8).map(j =>
          TextOps.minhash(transform(col("toks"), x => TextOps.hash32Sql(x)), j)): _*)
          .as("hof"))
      .filter(not(col("native") <=> col("hof")))
      .count()
    assert(sigMismatch == 0)
  }

  test("graft_simhash16 equals the HOF fold; empty array parity") {
    val spark = TestSpark.spark
    import spark.implicits._
    import graft.ext.TextOps
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val mismatch = docs
      .select(array_distinct(split(col("text"), " ")).as("toks"))
      .select(TextOps.simhash16(col("toks")).as("native"),
        TextOps.simhash16Hof(col("toks")).as("hof"))
      .filter(not(col("native") <=> col("hof")))
      .count()
    assert(mismatch == 0)
    // empty token set: all 16 counters are 0, every bit set — both forms
    val edge = Seq(Seq.empty[String]).toDF("toks")
      .select(TextOps.simhash16(col("toks")).as("native"),
        TextOps.simhash16Hof(col("toks")).as("hof"))
      .collect()(0)
    assert(edge.getLong(0) == 0xFFFFL && edge.getLong(1) == 0xFFFFL)
  }

  test("graft_shingles3 equals the HOF twin, including edge cases") {
    val spark = TestSpark.spark
    import spark.implicits._
    import graft.ext.TextOps
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val mismatch = docs
      .select(split(col("text"), " ").as("w"))
      .select(TextOps.shingles3(col("w")).as("native"),
        TextOps.shingles3Hof(col("w")).as("hof"))
      .filter(not(col("native") <=> col("hof")))
      .count()
    assert(mismatch == 0)
    // <3 tokens ⇒ empty; NULL input ⇒ empty (HOF/oracle CASE contract);
    // repeats deduplicate in first-occurrence order
    val edge = Seq(
        Seq("a"), Seq("a", "b"), Seq.empty[String], null,
        Seq("x", "y", "z", "x", "y", "z", "x"))
      .toDF("w")
      .select(TextOps.shingles3(col("w")).as("native"),
        TextOps.shingles3Hof(col("w")).as("hof"))
      .collect()
    for (r <- edge) assert(r.getSeq[String](0) == r.getSeq[String](1))
    assert(edge(3).getSeq[String](0) == Seq.empty) // null input ⇒ empty set
    assert(edge(4).getSeq[String](0) == Seq("x y z", "y z x", "z x y"))
  }

  test("graft_shingles3_all equals the non-deduping HOF transform") {
    val spark = TestSpark.spark
    import spark.implicits._
    import graft.ext.TextOps
    def hofAll(w: org.apache.spark.sql.Column) =
      when(size(w) >= 3, transform(sequence(lit(1), size(w) - 2),
        i => array_join(slice(w, i, lit(3)), " ")))
        .otherwise(array().cast("array<string>"))
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val mismatch = docs
      .select(split(col("text"), " ").as("w"))
      .select(TextOps.shingles3All(col("w")).as("native"), hofAll(col("w")).as("hof"))
      .filter(not(col("native") <=> col("hof")))
      .count()
    assert(mismatch == 0)
    val edge = Seq(Seq("a", "b"), Seq("x", "y", "z", "x", "y"))
      .toDF("w")
      .select(TextOps.shingles3All(col("w")).as("native"))
      .collect()
    assert(edge(0).getSeq[String](0) == Seq.empty)
    assert(edge(1).getSeq[String](0) == Seq("x y z", "y z x", "z x y"))
  }

  test("graft_ngrams equals the distinct HOF transform for n=2..5") {
    val spark = TestSpark.spark
    import spark.implicits._
    import graft.ext.TextOps
    def hofN(w: org.apache.spark.sql.Column, n: Int) =
      when(size(w) >= n, array_distinct(transform(
        sequence(lit(1), size(w) - (n - 1)),
        i => array_join(slice(w, i, lit(n)), " "))))
        .otherwise(array().cast("array<string>"))
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    for (n <- 2 to 5) {
      val mismatch = docs
        .select(split(col("text"), " ").as("w"))
        .select(TextOps.ngramsDistinct(col("w"), n).as("native"),
          hofN(col("w"), n).as("hof"))
        .filter(not(col("native") <=> col("hof")))
        .count()
      assert(mismatch == 0, s"n=$n")
    }
    // SQL registration peels the literal n
    val viaSql = spark.sql(
      "SELECT graft_ngrams(array('a','b','c','b','c'), 2) AS g")
      .collect()(0).getSeq[String](0)
    assert(viaSql == Seq("a b", "b c", "c b"))
  }

  test("graft_ngrams rejects non-literal / null n with an analysis error") {
    val spark = TestSpark.spark
    val colN = intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql(
        "SELECT graft_ngrams(array('a','b'), size(array('a'))+id) FROM range(1)")
        .collect()
    }
    assert(colN.getMessage.contains("integer literal"), colN.getMessage)
    val nullN = intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT graft_ngrams(array('a','b'), NULL)").collect()
    }
    assert(nullN.getMessage.contains("integer literal"), nullN.getMessage)
  }

  test("graft_cooccur_pairs equals the sorted-distinct HOF chain") {
    val spark = TestSpark.spark
    import spark.implicits._
    import graft.ext.TextOps
    def hofPairs(w: org.apache.spark.sql.Column) = {
      val toks = array_sort(array_distinct(w))
      flatten(transform(toks, (x, i) =>
        transform(slice(toks, i + 2, size(toks)), y => concat(x, lit(" "), y))))
    }
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val mismatch = docs
      .select(split(col("text"), " ").as("w"))
      .select(TextOps.cooccurPairs(col("w")).as("native"),
        hofPairs(col("w")).as("hof"))
      .filter(not(col("native") <=> col("hof")))
      .count()
    assert(mismatch == 0)
    val edge = Seq(Seq("b", "a", "b"), Seq("z"), Seq.empty[String])
      .toDF("w")
      .select(TextOps.cooccurPairs(col("w")).as("native"))
      .collect()
    assert(edge(0).getSeq[String](0) == Seq("a b"))
    assert(edge(1).getSeq[String](0) == Seq.empty)
    assert(edge(2).getSeq[String](0) == Seq.empty)
  }

  test("fuzz: new kernels equal their HOF twins on random unicode tokens") {
    val spark = TestSpark.spark
    import spark.implicits._
    import graft.ext.TextOps
    import org.scalacheck.Gen
    val tokGen = Gen.oneOf(
      Gen.oneOf("", "a", "b", "ab", "ß", "日本", "x y"), // adversarial: empty + multibyte + embedded space
      Gen.alphaNumStr.map(_.take(6)))
    val arrGen = Gen.choose(0, 12).flatMap(n => Gen.listOfN(n, tokGen))
    val corpusGen = Gen.listOfN(60, arrGen)
    def hofPairs(w: org.apache.spark.sql.Column) = {
      val toks = array_sort(array_distinct(w))
      flatten(transform(toks, (x, i) =>
        transform(slice(toks, i + 2, size(toks)), y => concat(x, lit(" "), y))))
    }
    def hofAll(w: org.apache.spark.sql.Column) =
      when(size(w) >= 3, transform(sequence(lit(1), size(w) - 2),
        i => array_join(slice(w, i, lit(3)), " ")))
        .otherwise(array().cast("array<string>"))
    def hofN(w: org.apache.spark.sql.Column, n: Int) =
      when(size(w) >= n, array_distinct(transform(
        sequence(lit(1), size(w) - (n - 1)),
        i => array_join(slice(w, i, lit(n)), " "))))
        .otherwise(array().cast("array<string>"))
    var cur = org.scalacheck.rng.Seed(7L)
    for (_ <- 1 to 4) {
      val corpus = corpusGen.pureApply(Gen.Parameters.default, cur)
      cur = cur.next
      val df = corpus.map(Tuple1(_)).toDF("w")
      val bad = df.select(
          TextOps.cooccurPairs(col("w")).as("np"), hofPairs(col("w")).as("hp"),
          TextOps.shingles3All(col("w")).as("na"), hofAll(col("w")).as("ha"),
          TextOps.ngramsDistinct(col("w"), 2).as("n2"), hofN(col("w"), 2).as("h2"),
          TextOps.ngramsDistinct(col("w"), 4).as("n4"), hofN(col("w"), 4).as("h4"))
        .filter(not(col("np") <=> col("hp")) || not(col("na") <=> col("ha")) ||
          not(col("n2") <=> col("h2")) || not(col("n4") <=> col("h4")))
        .count()
      assert(bad == 0)
    }
  }

  test("graft_simhash48 matches a HOF reconstruction; empty array parity") {
    val spark = TestSpark.spark
    import spark.implicits._
    import graft.ext.TextOps
    // HOF twin built inline from the SQL md5-prefix hash (first 12 hex
    // chars = 48 bits), the same reconstruction the DuckDB oracle runs
    def hash48Sql(c: Column) =
      conv(substring(md5(c.cast("binary")), 1, 12), 16, 10).cast("long")
    def simhash48Hof(tokens: Column): Column = {
      val hs = transform(tokens, hash48Sql(_))
      val zeros = array((0 until 48).map(_ => lit(0L)): _*)
      val bitSums = aggregate(hs, zeros, (acc, x) =>
        zip_with(acc, array((0 until 48).map(j =>
          shiftright(x, j).bitwiseAND(lit(1L)) * 2 - 1): _*), _ + _))
      (0 until 48).map(j =>
        when(element_at(bitSums, j + 1) >= 0, lit(1L << j)).otherwise(lit(0L)))
        .reduce(_ + _)
    }
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val mismatch = docs
      .select(array_distinct(split(col("text"), " ")).as("toks"))
      .select(TextOps.simhash48(col("toks")).as("native"),
        simhash48Hof(col("toks")).as("hof"))
      .filter(not(col("native") <=> col("hof")))
      .count()
    assert(mismatch == 0)
    val edge = Seq(Seq.empty[String]).toDF("toks")
      .select(TextOps.simhash48(col("toks")).as("native")).collect()(0)
    assert(edge.getLong(0) == (1L << 48) - 1)
  }

  test("graft_dot is bit-identical to the HOF fold dot product") {
    val spark = TestSpark.spark
    import graft.ext.Similarity
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val mismatch = e.as("a").crossJoin(e.as("b").limit(20))
      .select(Similarity.dot(col("a.v"), col("b.v")).as("native"),
        Similarity.dotHof(col("a.v"), col("b.v")).as("hof"))
      .filter(not(col("native") <=> col("hof")))
      .count()
    assert(mismatch == 0)
  }

  test("graft_intersect_card equals size(array_intersect) on sorted sets") {
    val spark = TestSpark.spark
    import graft.ext.TextOps
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val sets = docs.select(col("doc_id"),
      array_sort(array_distinct(transform(split(col("text"), " "),
        x => TextOps.hash32(x)))).as("hs"))
    val mismatch = sets.as("a").crossJoin(sets.as("b").limit(20))
      .select(
        call_function("graft_intersect_card", col("a.hs"), col("b.hs")).as("fast"),
        size(array_intersect(col("a.hs"), col("b.hs"))).as("ref"))
      .filter(col("fast") =!= col("ref"))
      .count()
    assert(mismatch == 0)
  }

  test("null-safe and codegen-compiled") {
    val spark = TestSpark.spark
    import spark.implicits._
    val df = Seq(Some("Ā"), None).toDF("s")
      .select(call_function("strip_accents_key", col("s")).as("k"))
    assert(df.collect().map(r => Option(r.getString(0))).toSeq == Seq(Some("a"), None))
    // over a real scan (not foldable literals) the projection must sit inside
    // a WholeStageCodegen stage (the "*(n)" prefix), not an interpreted
    // fallback — doGenCode is what's being exercised here
    val scanned = spark.read.parquet("/root/testdata/sf0.001/part.parquet")
      .select(call_function("strip_accents_key", col("p_name")).as("k"))
    assert(scanned.queryExecution.executedPlan.toString.contains("*(1)"))
    assert(scanned.collect().length > 0)
  }
}
