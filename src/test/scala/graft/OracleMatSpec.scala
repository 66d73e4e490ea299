package graft

import org.scalatest.funsuite.AnyFunSuite

/** The oracle-materialization render transform is load-bearing (a bad
  * injection would corrupt 21 oracles' SQL at the driver boundary):
  * pin the regex's behavior on the exact hazard shapes, and the
  * allowlist's structural invariants against the live catalog. */
class OracleMatSpec extends AnyFunSuite {

  test("injectMat rewrites CTE heads and ONLY CTE heads") {
    assert(SparkEntry.injectMat("WITH a AS (SELECT 1) SELECT * FROM a")
      == "WITH a AS MATERIALIZED (SELECT 1) SELECT * FROM a")
    // CAST's AS is followed by a type, never '(' — untouched
    assert(SparkEntry.injectMat("SELECT CAST(x AS BIGINT) FROM t")
      == "SELECT CAST(x AS BIGINT) FROM t")
    // column aliases (ident AS name) — untouched
    assert(SparkEntry.injectMat("SELECT sum(x) AS s FROM t")
      == "SELECT sum(x) AS s FROM t")
    // derived-table alias with a column list: ') AS t(c)' has no
    // identifier before AS — untouched
    assert(SparkEntry.injectMat("FROM (SELECT 1) AS t(c)")
      == "FROM (SELECT 1) AS t(c)")
    // already-materialized heads are NOT double-injected ('AS
    // MATERIALIZED (' contains no 'AS (' for the regex)
    val once = "WITH a AS MATERIALIZED (SELECT 1) SELECT * FROM a"
    assert(SparkEntry.injectMat(once) == once)
    // multi-CTE chains: every head rewritten
    assert(SparkEntry.injectMat("WITH a AS (SELECT 1), b2 AS (SELECT 2)x")
      == "WITH a AS MATERIALIZED (SELECT 1), b2 AS MATERIALIZED " +
        "(SELECT 2)x")
    // case-insensitive like the profiler's CTE_HEAD: a lowercase or
    // mixed-case head must not ship un-materialized
    assert(SparkEntry.injectMat("WITH a as (SELECT 1) SELECT * FROM a")
      == "WITH a as MATERIALIZED (SELECT 1) SELECT * FROM a")
    assert(SparkEntry.injectMat("WITH a As (SELECT 1) SELECT * FROM a")
      == "WITH a As MATERIALIZED (SELECT 1) SELECT * FROM a")
    // lowercase already-materialized heads: no double injection
    val lcOnce = "WITH a as MATERIALIZED (SELECT 1) SELECT * FROM a"
    assert(SparkEntry.injectMat(lcOnce) == lcOnce)
  }

  test("no bare CTE heads survive in allowlisted rendered SQL") {
    // belt-and-braces for the (?i) fix: a partial no-op injection
    // (some heads rewritten, some left bare) must fail loudly, not
    // ship as silent perf drift.
    val bareHead = """(?i)\b[A-Za-z_][A-Za-z0-9_]*\s+AS\s*\(""".r
    for (name <- SparkEntry.materializeAll) {
      val sql = SparkEntry.oracleSql(name)
      // the regex requires '(' right after AS, so a rewritten head
      // ('AS MATERIALIZED (') can never re-match — any match IS bare
      val bare = bareHead.findAllIn(sql).toList
      // every regex-matchable head in an allowlisted oracle must have
      // been rewritten (WINDOW clauses are barred by the test above)
      assert(bare.isEmpty,
        s"$name: bare CTE heads left un-materialized: $bare")
    }
  }

  test("injectMat rewrites exactly the CTE heads outside string literals") {
    // ADVICE r13: the old idempotence check ran on the RENDERED SQL,
    // where a literal already corrupted by the first pass can never
    // re-match — it only caught second-pass over-matches. Count instead
    // on the RAW SQL: the number of rewrites injectMat performs must
    // equal the number of CTE-head matches in the raw SQL with quoted
    // string literals blanked — so a head-shaped substring INSIDE a
    // literal ('x as (' in embedded fixture text) showing up as an
    // extra rewrite fails here, before the driver hash gate.
    val bareHead = """(?i)\b[A-Za-z_][A-Za-z0-9_]*\s+AS\s*\(""".r
    // SQL string literal with '' escapes; (?s) so embedded newlines
    // (the fixture feed/pdf literals) stay inside one literal. Unrolled
    // possessive form — the naive ([^']|'')* alternation-in-loop
    // stack-overflows Java regex on the multi-KB fixture literals
    val litRe = """(?s)'[^']*+(?:''[^']*+)*+'""".r
    val matRe = """(?i)\bAS\s+MATERIALIZED\s*\(""".r
    for (name <- SparkEntry.materializeAll) {
      val raw = SparkEntry.oracleSqlRaw(name)
      assert(matRe.findFirstIn(raw).isEmpty,
        s"$name: raw oracle already contains MATERIALIZED")
      val injected = SparkEntry.injectMat(raw)
      val rewrites = matRe.findAllIn(injected).size
      val headsOutsideLiterals =
        bareHead.findAllIn(litRe.replaceAllIn(raw, "''")).size
      assert(rewrites == headsOutsideLiterals,
        s"$name: injectMat performed $rewrites rewrites but the raw SQL " +
          s"has $headsOutsideLiterals CTE heads outside string literals " +
          "— the regex matched inside a literal or missed a head")
    }
  }

  test("allowlist invariants against the live catalog") {
    val oracles = SparkEntry.oracleSql
    // every allowlisted name is a real oracle
    assert(SparkEntry.materializeAll.subsetOf(oracles.keySet))
    for (name <- SparkEntry.materializeAll) {
      val sql = oracles(name)
      // the rendered SQL actually carries the injection
      assert(sql.contains("AS MATERIALIZED ("),
        s"$name: allowlisted but no MATERIALIZED in rendered SQL")
      // the WINDOW-clause hazard the profiler skips can never be
      // allowlisted (the regex would corrupt 'WINDOW w AS (...)')
      assert(!"""(?i)\bWINDOW\s+\w+\s+AS\s*\(""".r
        .findFirstIn(sql.replace("AS MATERIALIZED (", "AS (")).isDefined,
        s"$name: WINDOW clause inside an allowlisted oracle")
    }
  }
}
