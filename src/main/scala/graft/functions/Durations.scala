package graft.functions

/** Polars-style duration-string parsing.
  *
  * The reference accepts duration strings like `"1d"`, `"30m"`, `"1h30m"`,
  * `"3i"` (index/row count) everywhere a window size or tolerance is needed
  * (reference: native_shim/src/expr.rs:103-109 rolling window parse,
  * native_shim/src/lazy.rs:533-547 as-of tolerance parse,
  * native_shim/src/lazy.rs:186-273 dynamic group-by every/period/offset).
  *
  * We normalize every duration to either a row count (`Rows`) or a number of
  * microseconds (`Micros`) — Spark timestamps are microsecond-resolution, which
  * matches the reference's default `TimeUnit::Microseconds`.
  */
object Durations {
  sealed trait Duration { def isRows: Boolean }
  /** Fixed number of rows — Polars "3i". */
  final case class Rows(n: Long) extends Duration { def isRows = true }
  /** Physical time duration in microseconds. */
  final case class Micros(us: Long) extends Duration { def isRows = false }

  private val token = "([+-]?\\d+)(ns|us|ms|mo|[smhdwiyq])".r

  private val unitMicros: Map[String, Double] = Map(
    "ns" -> 1e-3,
    "us" -> 1.0,
    "ms" -> 1e3,
    "s"  -> 1e6,
    "m"  -> 60e6,
    "h"  -> 3600e6,
    "d"  -> 86400e6,
    "w"  -> 7 * 86400e6,
    // calendar units in a FIXED-WIDTH context (rolling range windows, as-of
    // tolerance) use the conventional fixed sizes — same split Polars makes;
    // calendar-true month arithmetic lives in parseMonthsAndMicros, used by
    // group_by_dynamic and offset_by.
    "mo" -> 30 * 86400e6,
    "q"  -> 91 * 86400e6,
    "y"  -> 365 * 86400e6,
  )

  private val unitMonths: Map[String, Long] = Map("mo" -> 1L, "q" -> 3L, "y" -> 12L)

  /** Parse a Polars duration string ("1h30m", "3i", "-2d") into a Duration. */
  def parse(s: String): Duration = {
    val trimmed = s.trim
    require(trimmed.nonEmpty, "empty duration string")
    val toks = token.findAllMatchIn(trimmed).toSeq
    val consumed = toks.map(_.matched.length).sum
    require(consumed == trimmed.length, s"cannot parse duration: '$s'")
    if (toks.exists(_.group(2) == "i")) {
      require(toks.size == 1, s"row-count duration must be a single token: '$s'")
      Rows(toks.head.group(1).toLong)
    } else {
      var total = 0.0
      toks.foreach { m => total += m.group(1).toLong * unitMicros(m.group(2)) }
      Micros(total.round)
    }
  }

  /** Parse a duration that must be physical time; returns microseconds. */
  def parseMicros(s: String): Long = parse(s) match {
    case Micros(us) => us
    case Rows(_) => throw new IllegalArgumentException(
      s"expected a time duration, got row-count duration: '$s'")
  }

  /** Parse a duration that must be a row count. */
  def parseRows(s: String): Long = parse(s) match {
    case Rows(n) => n
    case Micros(_) => throw new IllegalArgumentException(
      s"expected a row-count duration ('3i'), got time duration: '$s'")
  }

  /** Render microseconds as a Spark SQL interval string, e.g. for window(). */
  def microsToSparkInterval(us: Long): String = s"$us microseconds"

  /** Calendar-aware split: mo/q/y tokens accumulate MONTHS, everything else
    * microseconds — `"1y2mo3d"` → (14 months, 3 days of µs). Callers doing
    * calendar arithmetic (group_by_dynamic month grids, offset_by) apply the
    * month part with real month-add (variable length, day-clamped) and the
    * remainder as fixed µs. Row-count durations are rejected. */
  def parseMonthsAndMicros(s: String): (Long, Long) = {
    val trimmed = s.trim
    require(trimmed.nonEmpty, "empty duration string")
    val toks = token.findAllMatchIn(trimmed).toSeq
    val consumed = toks.map(_.matched.length).sum
    require(consumed == trimmed.length, s"cannot parse duration: '$s'")
    require(!toks.exists(_.group(2) == "i"), s"expected a time duration, got row count: '$s'")
    var months = 0L
    var us = 0.0
    toks.foreach { m =>
      val n = m.group(1).toLong
      unitMonths.get(m.group(2)) match {
        case Some(mo) => months += n * mo
        case None     => us += n * unitMicros(m.group(2))
      }
    }
    (months, us.round)
  }

  /** True when the duration has a calendar (month-based) component. */
  def isCalendar(s: String): Boolean = parseMonthsAndMicros(s)._1 != 0L
}
