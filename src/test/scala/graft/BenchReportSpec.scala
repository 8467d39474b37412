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
}
