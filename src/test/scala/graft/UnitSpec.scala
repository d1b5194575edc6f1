package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.functions.{ChronoFormat, Durations}

class DurationsSpec extends AnyFunSuite {
  test("time units parse to microseconds") {
    assert(Durations.parseMicros("1d") == 86400000000L)
    assert(Durations.parseMicros("30m") == 1800000000L)
    assert(Durations.parseMicros("1h30m") == 5400000000L)
    assert(Durations.parseMicros("2h") == 7200000000L)
    assert(Durations.parseMicros("1s") == 1000000L)
    assert(Durations.parseMicros("500ms") == 500000L)
    assert(Durations.parseMicros("-2d") == -2 * 86400000000L)
    assert(Durations.parseMicros("1w") == 7 * 86400000000L)
  }
  test("row-count durations ('3i')") {
    assert(Durations.parseRows("3i") == 3L)
    assert(Durations.parse("7i") == Durations.Rows(7))
    intercept[IllegalArgumentException](Durations.parseMicros("3i"))
    intercept[IllegalArgumentException](Durations.parseRows("1h"))
  }
  test("garbage rejected") {
    intercept[IllegalArgumentException](Durations.parse("abc"))
    intercept[IllegalArgumentException](Durations.parse(""))
    intercept[IllegalArgumentException](Durations.parse("1h banana"))
  }
}

class ChronoFormatSpec extends AnyFunSuite {
  test("common chrono patterns translate to Java patterns") {
    assert(ChronoFormat.toJava("%Y-%m-%d") == "yyyy-MM-dd")
    assert(ChronoFormat.toJava("%Y-%m-%d %H:%M:%S") == "yyyy-MM-dd HH:mm:ss")
    assert(ChronoFormat.toJava("%d/%m/%y") == "dd/MM/yy")
    assert(ChronoFormat.toJava("%H:%M:%S.%f") == "HH:mm:ss.SSSSSS")
  }
  test("literal letters are quoted; %% is literal percent") {
    assert(ChronoFormat.toJava("%YT%m") == "yyyy'T'MM")
    assert(ChronoFormat.toJava("100%%") == "100%")
  }
  test("unknown specifier rejected") {
    intercept[IllegalArgumentException](ChronoFormat.toJava("%Q"))
  }
}
