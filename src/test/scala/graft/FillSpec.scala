package graft.enrich

import org.scalatest.funsuite.AnyFunSuite

import graft.enrich.Rem2Fill.{FillIn, FillOut}

/** W1/W2 fill-pass semantics (SURVEY §2.5, H2) against hand-traced scenarios
  * from main.py:950–1028. */
class FillSpec extends AnyFunSuite {

  private def run(rows: (String, String)*): Seq[FillOut] =
    Rem2Fill.fillSeq(rows.zipWithIndex.map { case ((n, c), i) =>
      FillIn(i.toLong, n, c)
    }.toArray).toSeq

  test("unique row keeps its own candidate") {
    val out = run(("A", "r1"), ("B", "r2"))
    assert(out.map(_.rem2) == Seq("r1", "r2"))
    assert(out.forall(o => !o.flag_rem2_missing && !o.flag_rem2_conflict))
  }

  test("unique row with empty candidate goes yellow") {
    val out = run(("A", "r1"), ("B", ""))
    assert(out(1).rem2 == "" && out(1).flag_rem2_missing && !out(1).flag_rem2_conflict)
  }

  test("UNKNOWN rows are always empty + yellow, and invisible to neighbors") {
    val out = run(("A", "r"), ("UNKNOWN", "x"), ("B", "r2"))
    assert(out(1).rem2 == "" && out(1).flag_rem2_missing)
    // note: an UNKNOWN row's non-empty CANDIDATE still feeds prev scans
    // (the reference only blanks the cell, not the candidate list)
  }

  test("duplicate with agreeing prev/next candidates fills in pass 2") {
    val out = run(("A", "r"), ("Dup", ""), ("Dup", ""), ("B", "r"))
    assert(out(1).rem2 == "r" && !out(1).flag_rem2_conflict)
    // second dup sees the PASS-2 MUTATED candidate of the first (main.py:990)
    assert(out(2).rem2 == "r" && !out(2).flag_rem2_conflict)
  }

  test("duplicate with conflicting neighbors goes red") {
    val out = run(("A", "r1"), ("Dup", ""), ("Dup", ""), ("B", "r2"))
    assert(out(1).rem2 == "" && out(1).flag_rem2_conflict)
    assert(out(2).rem2 == "" && out(2).flag_rem2_conflict)
  }

  test("duplicate's own candidate is ignored — neighbor consensus rules") {
    // both dups carry s, but neighbors agree on r ⇒ r wins (reference
    // semantics: dup rows never read their own candidate)
    val out = run(("A", "r"), ("Dup", "s"), ("Dup", ""), ("B", "r"))
    // dup1: prev=r, next="" -> next non-empty is r (B) since dup2 cand empty
    assert(out(1).rem2 == "r")
    assert(out(2).rem2 == "r") // prev = dup1's mutated r? no: dup1 cand was s
    // trace: dup2 prev scans candidates: dup1's cand s was NOT mutated
    // (dup1 filled via consensus r, mutating cands[1]=r, main.py:988–990)
  }

  test("pass 3 fills chains pass 2 could not (H2)") {
    // conflict pattern in CANDIDATES, but pass-2 CELLS collapse to agreement:
    // A(r) U1("") D1(s) D2(s) U2("") B(r) — all four middle rows red in
    // pass 2 (candidate neighbors differ), then pass 3 sees cells
    // [r,"","","","",r] and fills every gap with r, clearing the reds.
    val out = run(("A", "r"), ("JS", ""), ("M", "s"), ("M", "s"), ("JS", ""), ("B", "r"))
    assert(out(1).rem2 == "r" && !out(1).flag_rem2_conflict)
    assert(out(2).rem2 == "r" && !out(2).flag_rem2_conflict)
    assert(out(3).rem2 == "r" && !out(3).flag_rem2_conflict)
    assert(out(4).rem2 == "r" && !out(4).flag_rem2_conflict)
  }

  test("unresolvable conflict stays red through pass 3") {
    val out = run(("A", "r1"), ("Dup", ""), ("Dup", ""), ("B", "r2"))
    assert(out(1).flag_rem2_conflict && out(2).flag_rem2_conflict)
  }

  test("dup at the sequence edge (no next) goes red") {
    val out = run(("A", "r"), ("Dup", ""), ("Dup", ""))
    assert(out(1).flag_rem2_conflict && out(1).rem2 == "")
    assert(out(2).flag_rem2_conflict && out(2).rem2 == "")
  }
}
