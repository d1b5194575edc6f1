package graft

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.Durations

/** Property tests for the plan-free algebra (duration parser), via raw
  * ScalaCheck (no scalatest bridge in the offline cache). */
class PropertySpec extends AnyFunSuite {

  private def check(p: Prop): Unit = {
    val r = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(200), p)
    assert(r.passed, r.status.toString)
  }

  private val unitGen = Gen.oneOf("s" -> 1000000L, "m" -> 60000000L,
    "h" -> 3600000000L, "d" -> 86400000000L)

  test("duration parse is linear: parse(n·u) == n·parse(1u)") {
    check(Prop.forAll(Gen.choose(1L, 10000L), unitGen) { (n, u) =>
      Durations.parseMicros(s"$n${u._1}") == n * u._2
    })
  }

  test("concatenated tokens add") {
    check(Prop.forAll(Gen.choose(1L, 1000L), Gen.choose(1L, 59L)) { (h, m) =>
      Durations.parseMicros(s"${h}h${m}m") ==
        Durations.parseMicros(s"${h}h") + Durations.parseMicros(s"${m}m")
    })
  }

  test("row-count parse round-trips") {
    check(Prop.forAll(Gen.choose(1L, 1000000L)) { n =>
      Durations.parseRows(s"${n}i") == n
    })
  }

  test("calendar split: mo/q/y accumulate months, rest microseconds") {
    check(Prop.forAll(Gen.choose(1L, 1000L), Gen.choose(1L, 1000L)) { (n, d) =>
      Durations.parseMonthsAndMicros(s"${n}mo") == (n, 0L) &&
      Durations.parseMonthsAndMicros(s"${n}q") == (3 * n, 0L) &&
      Durations.parseMonthsAndMicros(s"${n}y") == (12 * n, 0L) &&
      Durations.parseMonthsAndMicros(s"${n}mo${d}d") == (n, d * 86400000000L)
    })
  }

  test("isCalendar exactly when a month unit is present") {
    check(Prop.forAll(Gen.choose(1L, 1000L), unitGen) { (n, u) =>
      !Durations.isCalendar(s"$n${u._1}") &&
      Durations.isCalendar(s"${n}mo") &&
      Durations.isCalendar(s"$n${u._1}1mo")
    })
  }
}
