package graft

import org.scalatest.funsuite.AnyFunSuite

/** The bench's boot_coeff is only meaningful if Bench.ControlRefs really
  * are the recorded round-12 control minima — pin them to the committed
  * artifacts so a ref edit (or an artifact regeneration) can't silently
  * skew every future cross-round comparison. */
class BenchControlsSpec extends AnyFunSuite {

  private def minsFrom(paths: Seq[String]): Map[String, Double] = {
    // minimal JSON digging without a JSON dep: the bench record is one
    // flat line; extract "name":<num> pairs from the queries block.
    // ADVICE r13: the numeric alternative covers integer renderings too
    // (a plain "x9_lang_id":1 would otherwise drop out of the min)
    val num = """"([A-Za-z0-9_]+)":([0-9]+(?:\.[0-9]+)?(?:[Ee][+-]?[0-9]+)?)""".r
    val maps = paths.map { p =>
      val txt = new String(java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(p)), java.nio.charset.StandardCharsets.UTF_8)
      num.findAllMatchIn(txt).map(m => m.group(1) -> m.group(2).toDouble)
        .toSeq.groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2).min }
    }
    maps.reduce { (a, b) =>
      (a.keySet ++ b.keySet).map { k =>
        k -> math.min(a.getOrElse(k, Double.MaxValue),
          b.getOrElse(k, Double.MaxValue))
      }.toMap
    }
  }

  test("Bench.ControlRefs == min over the two committed r12 sweeps") {
    val r12 = Seq("BENCH_FULL_r12.json", "BENCH_FULL_r12_run2.json")
    // ADVICE r13: FAIL (not cancel) when the anchor artifacts are gone —
    // a deleted/renamed r12 record would otherwise silently unpin
    // boot_coeff's reference
    assert(r12.forall(p => java.nio.file.Files.exists(
      java.nio.file.Paths.get(p))),
      "r12 bench artifacts missing — boot_coeff's anchor is unverifiable")
    val mins = minsFrom(r12)
    for ((name, ref) <- Bench.ControlRefs) {
      assert(mins.contains(name), s"control $name missing from r12 records")
      assert(math.abs(mins(name) - ref) < 1e-9,
        s"Bench.ControlRefs($name)=$ref drifted from the committed " +
          s"r12 min ${mins(name)} — boot_coeff would silently skew")
    }
  }
}
