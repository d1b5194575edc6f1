package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** chrono/strftime → Spark translation.
  *
  * The reference's `str.to_date(format)` / `str.to_datetime(format)` /
  * `dt.to_string(format)` take chrono format strings like "%Y-%m-%d %H:%M:%S"
  * (native_shim/src/expr.rs:503-536, 550-564). Spark's `to_date` /
  * `to_timestamp` / `date_format` take Java patterns ("yyyy-MM-dd HH:mm:ss"),
  * so the user-facing API translates at the boundary.
  *
  * Two faces:
  *  - [[toJava]] — pattern-string translation for the PARSE direction
  *    (`try_to_timestamp`). Only specifiers Java can parse are allowed.
  *  - [[formatColumn]] — the FORMAT direction (`dt.to_string`). Spark 3+
  *    rejects Java week-based pattern letters (`ww`/`YYYY`/`e`) outright, and
  *    even where Java accepts them their week rules are locale-dependent
  *    (US weeks start Sunday), not chrono's ISO 8601. So ISO-week and the
  *    other non-Java specifiers are compiled to real Spark expressions
  *    (`weekofyear`, Thursday-of-week year shift, …) and stitched into the
  *    surrounding `date_format` output with `concat`. A format whose
  *    specifiers are all Java-safe compiles to a single `date_format` call —
  *    the common case stays one codegen'd expression.
  *
  * Documented delta: chrono's `%f` prints nanoseconds; this engine is
  * µs-precision end to end (SURVEY §1.2), so `%f` prints the 6-digit
  * microsecond fraction (DuckDB's `%f` semantics).
  */
object ChronoFormat {

  /** Specifiers with a faithful Java pattern (locale-safe under Locale.US:
    * English month/weekday names, AM/PM markers — chrono's own defaults). */
  private val javaMapping: Map[Char, String] = Map(
    'Y' -> "yyyy",   // full year
    'y' -> "yy",     // 2-digit year
    'm' -> "MM",     // month number
    'd' -> "dd",     // day of month
    'H' -> "HH",     // hour 00-23
    'I' -> "hh",     // hour 01-12
    'M' -> "mm",     // minute
    'S' -> "ss",     // second
    'f' -> "SSSSSS", // fractional seconds, µs width 6 (see scaladoc)
    'p' -> "a",      // AM/PM
    'b' -> "MMM",    // abbreviated month name
    'h' -> "MMM",    // = %b
    'B' -> "MMMM",   // full month name
    'a' -> "EEE",    // abbreviated weekday
    'A' -> "EEEE",   // full weekday
    'j' -> "DDD",    // day of year, zero-padded 3
    'Z' -> "zzz",    // tz name
    'z' -> "xx",     // tz offset +0000
  )

  /** Specifiers compiled to Spark expressions in [[formatColumn]] (no Java
    * pattern is faithful: Spark bans week-based letters, and Java has no
    * space-padded or epoch fields). */
  private val exprSpecs: Set[Char] = Set('V', 'G', 'g', 'u', 'w', 'e', 'k', 'l', 'P', 's', 'C')

  /** chrono composite specifiers, expanded before tokenizing. */
  private val composites: Map[Char, String] = Map(
    'F' -> "%Y-%m-%d",
    'T' -> "%H:%M:%S",
    'D' -> "%m/%d/%y",
    'R' -> "%H:%M",
    'r' -> "%I:%M:%S %p",
    'x' -> "%m/%d/%y",
    'X' -> "%H:%M:%S",
    'c' -> "%a %b %e %H:%M:%S %Y",
    'v' -> "%e-%b-%Y",
  )

  private sealed trait Tok
  private case class LitTok(s: String) extends Tok
  private case class JavaTok(spec: Char) extends Tok
  private case class ExprTok(spec: Char) extends Tok

  private def expandComposites(fmt: String, depth: Int = 0): String = {
    require(depth < 4, s"chrono composite expansion loop in '$fmt'")
    val out = new StringBuilder
    var i = 0
    var expanded = false
    while (i < fmt.length) {
      val c = fmt.charAt(i)
      if (c == '%' && i + 1 < fmt.length && composites.contains(fmt.charAt(i + 1))) {
        out.append(composites(fmt.charAt(i + 1))); expanded = true; i += 2
      } else if (c == '%' && i + 1 < fmt.length) {
        out.append(c).append(fmt.charAt(i + 1)); i += 2
      } else { out.append(c); i += 1 }
    }
    if (expanded) expandComposites(out.toString, depth + 1) else out.toString
  }

  private def tokenize(chrono: String): Vector[Tok] = {
    val fmt = expandComposites(chrono)
    val toks = Vector.newBuilder[Tok]
    val lit = new StringBuilder
    def flush(): Unit = if (lit.nonEmpty) { toks += LitTok(lit.toString); lit.clear() }
    var i = 0
    while (i < fmt.length) {
      val c = fmt.charAt(i)
      if (c == '%' && i + 1 < fmt.length) {
        fmt.charAt(i + 1) match {
          case '%' => lit.append('%')
          case 'n' => lit.append('\n')
          case 't' => lit.append('\t')
          case s if javaMapping.contains(s) => flush(); toks += JavaTok(s)
          case s if exprSpecs.contains(s) => flush(); toks += ExprTok(s)
          case s => throw new IllegalArgumentException(
            s"unsupported chrono specifier %$s in '$chrono'")
        }
        i += 2
      } else if (c == '%') {
        throw new IllegalArgumentException(s"trailing % in chrono format '$chrono'")
      } else { lit.append(c); i += 1 }
    }
    flush()
    toks.result()
  }

  /** Quote a literal run for a Java datetime pattern: letters and reserved
    * punctuation (`#{}[]`, the optional-section/future-use markers) are
    * quoted, embedded quotes doubled. */
  private val reservedPunct = "#{}[]"
  private def javaLiteral(s: String): String = {
    val out = new StringBuilder
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '\'') out.append("''")
      else if (c.isLetter || reservedPunct.contains(c)) {
        out.append('\'')
        while (i < s.length && (s.charAt(i).isLetter || reservedPunct.contains(s.charAt(i)))) {
          if (s.charAt(i) == '\'') out.append("''") else out.append(s.charAt(i))
          i += 1
        }
        out.append('\'')
        i -= 1
      } else out.append(c)
      i += 1
    }
    out.toString
  }

  /** True if the (composite-expanded) format uses the given specifier —
    * e.g. `usesSpec(fmt, 'y')`: two-digit year, whose PARSE century rule
    * differs between Java (2000-2099) and chrono/C (69-99 → 19xx). */
  def usesSpec(chrono: String, spec: Char): Boolean =
    tokenize(chrono).exists {
      case JavaTok(s) => s == spec
      case ExprTok(s) => s == spec
      case _ => false
    }

  /** Space-padded numeric specifiers (chrono prints " 5"): parseable via a
    * 1-2-digit Java numeric field behind an optional-section literal space
    * that absorbs the pad — "[ ]d" accepts both " 5" and "15". Chrono
    * parses these fine (they're plain numeric fields to its parser), so
    * rejecting them was a real gap for %e and the %c/%v composites. */
  private val parseSpaced: Map[Char, String] = Map(
    'e' -> "[ ]d",  // space-padded day of month
    'k' -> "[ ]H",  // space-padded hour 00-23
    'l' -> "[ ]h",  // space-padded hour 01-12
  )

  /** Translate a chrono/strftime pattern into a Java datetime pattern (the
    * PARSE direction). Space-padded numerics (%e/%k/%l) become optional-pad
    * Java fields; the remaining expression-only specifiers (ISO week
    * fields, epoch seconds, %P/%C) are rejected — chrono cannot resolve a
    * date from them either (week fields and derived values don't form a
    * complete date in its parser). */
  def toJava(chrono: String): String =
    tokenize(chrono).map {
      case LitTok(s) => javaLiteral(s)
      case JavaTok(s) => javaMapping(s)
      case ExprTok(s) if parseSpaced.contains(s) => parseSpaced(s)
      case ExprTok(s) => throw new IllegalArgumentException(
        s"chrono specifier %$s is not supported for parsing in '$chrono'")
    }.mkString

  /** ISO 8601 week-year: the calendar year of the Thursday in this date's
    * Mon-Sun week (`weekday` is 0=Mon..6=Sun, so Thursday = day + (3 - wd)). */
  private def isoYear(c: Column): Column = {
    val d = to_date(c)
    year(date_add(d, lit(3) - weekday(d)))
  }

  private def pad0(c: Column, n: Int): Column = lpad(c.cast("string"), n, "0")

  private def exprFor(spec: Char, c: Column): Column = spec match {
    case 'V' => pad0(weekofyear(c), 2)                   // ISO week 01-53
    case 'G' => pad0(isoYear(c), 4)                      // ISO week-year
    case 'g' => pad0(pmod(isoYear(c), lit(100)), 2)      // 2-digit ISO week-year
    case 'u' => (weekday(c) + lit(1)).cast("string")     // ISO weekday Mon=1
    case 'w' => (dayofweek(c) - lit(1)).cast("string")   // C weekday Sun=0
    case 'e' => lpad(dayofmonth(c).cast("string"), 2, " ")
    case 'k' => lpad(hour(c).cast("string"), 2, " ")
    case 'l' =>
      val h12 = when(pmod(hour(c), lit(12)) === lit(0), lit(12))
        .otherwise(pmod(hour(c), lit(12)))
      lpad(h12.cast("string"), 2, " ")
    case 'P' => lower(date_format(c, "a"))               // am/pm
    case 'C' =>                                          // century, 2-digit
      val y = year(c)
      pad0(((y - pmod(y, lit(100))).cast("decimal(18,0)") / lit(100)).cast("int"), 2)
    case 's' =>                                          // Unix epoch seconds (floor)
      val us = unix_micros(c.cast("timestamp"))
      ((us - pmod(us, lit(1000000L))).cast("decimal(38,0)") / lit(1000000)).cast("long").cast("string")
    case other => throw new IllegalArgumentException(s"no expression for %$other")
  }

  /** Compile `dt.to_string(chronoFmt)` for column `c`: contiguous Java-safe
    * runs become one `date_format` each; ISO-week/space-padded/epoch
    * specifiers become Spark expressions; the pieces concat in order. */
  def formatColumn(c: Column, chrono: String): Column = {
    val toks = tokenize(chrono)
    // group maximal runs of LitTok/JavaTok into single date_format segments
    val segs = Vector.newBuilder[Column]
    val javaRun = new StringBuilder
    def flushRun(): Unit = if (javaRun.nonEmpty) {
      segs += date_format(c, javaRun.toString); javaRun.clear()
    }
    toks.foreach {
      case LitTok(s) => javaRun.append(javaLiteral(s))
      case JavaTok(s) =>
        // adjacent same-letter fields (%B%m → "MMMM"+"MM") would merge into
        // one longer — invalid — Java field; split them across segments
        val jp = javaMapping(s)
        if (javaRun.nonEmpty && javaRun.last == jp.head) flushRun()
        javaRun.append(jp)
      case ExprTok(s) => flushRun(); segs += exprFor(s, c)
    }
    flushRun()
    segs.result() match {
      case Vector() => lit("")
      case Vector(one) => one
      case many => concat(many: _*)
    }
  }
}
