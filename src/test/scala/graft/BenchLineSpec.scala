package graft

import org.scalatest.funsuite.AnyFunSuite

/** The bench stdout line must fit the driver's 2000-char tail window at
  * ANY query count — rounds 4 and 7 both shipped `parsed:null` artifacts
  * when it didn't (ADVICE r9 asked for this bound to be pinned). The
  * ladder (full 2-dec map → 1-dec → top-K slowest + rollup → marker) is
  * pure, so this drives it with synthetic query populations well past
  * today's ~100. */
class BenchLineSpec extends AnyFunSuite {

  private def synth(n: Int): Seq[(String, Double)] =
    (1 to n).map(i => f"family_operator_name_$i%03d" -> (0.05 * (i % 40) + 0.123))

  test("stdout line fits the driver window from 1 to 300 queries") {
    for (n <- Seq(1, 10, 50, 82, 99, 120, 150, 200, 300)) {
      val line = Bench.stdoutLine(synth(n), "/root/testdata/sf0.1", "0.39",
        "false", "1.44", 75)
      assert(line.length <= Bench.MaxLine,
        s"n=$n: line ${line.length} chars exceeds ${Bench.MaxLine}")
      assert(line.startsWith("""{"metric":"total","value":""") && line.endsWith("}"),
        s"n=$n: malformed line")
    }
  }

  test("round-trip fields and the failed-query list are always present") {
    import org.json4s._
    import org.json4s.jackson.JsonMethods
    val line = Bench.stdoutLine(synth(120), "/root/testdata/sf0.1", "0.39",
      "false", "1.44", 75, failed = Seq("ev_asof_join", "ev_transitions"))
    assert(line.length <= Bench.MaxLine)
    val parsed = JsonMethods.parse(line)
    // same field set as the canonical BENCH.json record (ADVICE r11 low)
    for (f <- Seq("sf", "load_before", "load_after", "wait_sec", "failed",
                  "contaminated"))
      assert((parsed \ f) != JNothing, s"missing field $f")
    val JArray(fs) = (parsed \ "failed"): @unchecked
    assert(fs == List(JString("ev_asof_join"), JString("ev_transitions")))
    // a failing query must be impossible to mistake for a fast one
    val clean = Bench.stdoutLine(synth(120), "/root/testdata/sf0.1", "0.39",
      "false", "1.44", 75)
    val JArray(none) = (JsonMethods.parse(clean) \ "failed"): @unchecked
    assert(none.isEmpty)
  }

  test("degraded lines stay parseable JSON with the headline total intact") {
    import org.json4s._
    import org.json4s.jackson.JsonMethods
    for (n <- Seq(99, 150, 300)) {
      val results = synth(n)
      val line = Bench.stdoutLine(results, "/root/testdata/sf0.1", "0.39",
        "false", "1.44", 75)
      val parsed = JsonMethods.parse(line)
      val JDouble(total) = (parsed \ "value"): @unchecked
      assert(math.abs(total - results.map(_._2).sum) < 0.001)
      val JObject(fields) = (parsed \ "queries"): @unchecked
      assert(fields.nonEmpty)
      // the top-K rung must preserve the rollup invariants when present
      val m = fields.toMap
      (m.get("_rest_n"), m.get("_rest_total")) match {
        case (Some(JInt(rn)), Some(_)) =>
          assert(fields.size - 2 + rn.toInt === n, s"n=$n: top-K + rest != all")
        case _ =>
          assert(fields.size === n, s"n=$n: full map missing queries")
      }
    }
  }

  test("empty result set still emits a valid line") {
    val line = Bench.stdoutLine(Nil, "sf0.1", "-1", "null")
    assert(line.length <= Bench.MaxLine)
    assert(line.contains(""""value":0.000"""))
  }
}
