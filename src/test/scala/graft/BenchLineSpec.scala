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
    // same field set as the canonical BENCH.json record (ADVICE r11 low;
    // failed_n + filtered added for ADVICE r12)
    for (f <- Seq("sf", "load_before", "load_after", "wait_sec", "failed",
                  "failed_n", "filtered", "contaminated"))
      assert((parsed \ f) != JNothing, s"missing field $f")
    val JArray(fs) = (parsed \ "failed"): @unchecked
    assert(fs == List(JString("ev_asof_join"), JString("ev_transitions")))
    assert((parsed \ "failed_n") == JInt(2))
    assert((parsed \ "filtered") == JBool(false))
    // a failing query must be impossible to mistake for a fast one
    val clean = Bench.stdoutLine(synth(120), "/root/testdata/sf0.1", "0.39",
      "false", "1.44", 75)
    val JArray(none) = (JsonMethods.parse(clean) \ "failed"): @unchecked
    assert(none.isEmpty)
  }

  test("mass failure: floor rung still fits and self-identifies (ADVICE r12)") {
    import org.json4s._
    import org.json4s.jackson.JsonMethods
    // Worst case: every query fails (bad SF dir / flavor flip). Failed
    // queries are excluded from results by main, so the queries map is
    // empty and ONLY the failed list competes for line budget.
    for (n <- Seq(115, 300)) {
      val allFailed = synth(n).map(_._1)
      val line = Bench.stdoutLine(Nil, "/root/testdata/sf0.1", "0.39",
        "false", "1.44", 75, failed = allFailed)
      assert(line.length <= Bench.MaxLine,
        s"n=$n: mass-failure line ${line.length} chars exceeds ${Bench.MaxLine}")
      val parsed = JsonMethods.parse(line)
      // the true count survives truncation, and the shown names are a
      // prefix of the real list — the record can't understate the damage
      assert((parsed \ "failed_n") == JInt(n))
      val JArray(shown) = (parsed \ "failed"): @unchecked
      assert(shown.size <= Bench.FailedCap && shown.nonEmpty)
      assert(shown.map { case JString(s) => s; case _ => "" } ==
        allFailed.take(shown.size))
      assert((parsed \ "value") == JDouble(0.0))
    }
    // moderate failure count with a full result map: full list when it fits
    val some = synth(115).map(_._1).take(4)
    val withResults = Bench.stdoutLine(synth(115), "/root/testdata/sf0.1",
      "0.39", "false", "1.44", 75, failed = some)
    assert(withResults.length <= Bench.MaxLine)
    val JArray(full) = (JsonMethods.parse(withResults) \ "failed"): @unchecked
    assert(full.size == 4)
  }

  test("a filtered run self-identifies in-band (ADVICE r12)") {
    import org.json4s._
    import org.json4s.jackson.JsonMethods
    val line = Bench.stdoutLine(synth(3), "/root/testdata/sf0.1", "0.39",
      "false", "1.44", 0, filtered = true)
    assert((JsonMethods.parse(line) \ "filtered") == JBool(true))
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
