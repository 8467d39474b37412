package graft

import org.scalatest.funsuite.AnyFunSuite

/** The bench report contract: a thrown query must surface as an error
  * entry, never as a timing the driver could mistake for a fast run
  * (round-6 postmortem: q89's 0.119 s "measurement" was time-to-exception).
  */
class BenchReportSpec extends AnyFunSuite {

  test("mergePasses: min of successes; one good pass rescues; double failure stays err") {
    val p1 = Map[String, Either[String, Double]](
      "a" -> Right(2.0), "b" -> Right(1.0), "c" -> Left("boom1"),
      "d" -> Left("boom-d"))
    val p2 = Map[String, Either[String, Double]](
      "a" -> Right(1.5), "b" -> Left("flake"), "c" -> Right(3.0),
      "d" -> Left("boom-d2"))
    val m = Bench.mergePasses(p1, p2)
    assert(m("a") === Right(1.5)) // min of two successes
    assert(m("b") === Right(1.0)) // pass-2 flake: keep the real measurement
    assert(m("c") === Right(3.0)) // pass-1 flake: ditto
    assert(m("d") === Left("boom-d")) // both threw: error, no number
  }

  test("mergePasses: a partial second pass keeps first-pass results instead of throwing") {
    val p1 = Map[String, Either[String, Double]](
      "a" -> Right(2.0), "b" -> Left("boom"))
    // pass 2 died after one query: its map is missing b entirely
    val p2 = Map[String, Either[String, Double]]("a" -> Right(1.0))
    val m = Bench.mergePasses(p1, p2)
    assert(m("a") === Right(1.0))
    assert(m("b") === Left("boom"), "missing pass-2 key must fall back to pass 1")
    assert(m.size === 2)
  }

  test("renderJson: errored query appears ONLY under errors, total sums successes only") {
    val merged = Map[String, Either[String, Double]](
      "q01" -> Right(1.25), "q02" -> Left("AnalysisException: it broke"))
    val json = Bench.renderJson(merged, "/data/sf0.1")
    assert(json.contains("\"q01\":1.25"))
    assert(json.contains("\"errors\":{\"q02\":\"AnalysisException: it broke\"}"))
    assert(!json.contains("\"q02\":0"), "a broken query must not get a timing")
    assert(json.contains("\"value\":1.25"), s"total must exclude the error: $json")
    assert(json.contains("\"methodology\":"))
    // and the line is machine-parseable JSON even with hostile error text
    val hostile = Map[String, Either[String, Double]](
      "qx" -> Left("msg with \"quotes\"\nand\tcontrol\\chars"))
    val line = Bench.renderJson(hostile, "/d")
    assert(!line.split("\n")(0).isEmpty && line.split("\n").length === 1)
  }

  test("worstMovers: ratio AND absolute gates, worst first, capped at n; missing ref rows skip") {
    val ref = Map("q1" -> 1.0, "q2" -> 2.0, "q3" -> 0.1, "q4" -> 4.0)
    val now = Map(
      "q1" -> 1.8, // 1.8x and +0.8 s: a mover
      "q2" -> 2.4, // 1.2x: ratio gate drops it (session spread)
      "q3" -> 0.35, // 3.5x but +0.25 s: absolute gate drops noise jumps
      "q4" -> 14.0, // 3.5x and +10 s: the worst mover
      "q9" -> 50.0) // no reference row (new query): nothing to compare
    assert(Bench.worstMovers(now, ref, n = 8) === Seq("q4", "q1"))
    assert(Bench.worstMovers(now, ref, n = 1) === Seq("q4"))
    assert(Bench.worstMovers(now, ref, n = 0) === Seq.empty)
    assert(Bench.worstMovers(now, Map.empty, n = 8) === Seq.empty,
      "first run (no artifact) re-times nothing")
  }

  test("refTimes: parses query keys out of a previous artifact, skips error strings; absent file is empty") {
    val f = java.nio.file.Files.createTempFile("bench-ref", ".json")
    java.nio.file.Files.writeString(f,
      """{"metric":"total","value":3.5,"unit":"sec",""" +
        """"queries":{"q01_agg":1.25,"q106_lsh_tuning":2.25},""" +
        """"errors":{"q02_join":"boom: 1.5 things"},"sf":"/d"}""")
    val r = Bench.refTimes(f.toString)
    assert(r === Map("q01_agg" -> 1.25, "q106_lsh_tuning" -> 2.25),
      s"error strings and non-query keys must not parse as timings: $r")
    assert(Bench.refTimes("/nonexistent/bench.json") === Map.empty)
  }

  test("renderJson: retimed floors ride beside the sweep numbers") {
    val merged = Map[String, Either[String, Double]]("q01_x" -> Right(4.0))
    val json = Bench.renderJson(merged, "/d", Map("q01_x" -> 1.5))
    assert(json.contains("\"q01_x\":4.0") &&
      json.contains("\"retimed\":{\"q01_x\":1.5}"),
      s"both the sweep number and the floor must ship: $json")
  }
}
