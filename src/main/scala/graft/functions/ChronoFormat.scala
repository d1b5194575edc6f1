package graft.functions

/** chrono/strftime → Java DateTimeFormatter pattern translation.
  *
  * The reference's `str.to_date(format)` / `str.to_datetime(format)` /
  * `dt.to_string(format)` take chrono format strings like "%Y-%m-%d %H:%M:%S"
  * (native_shim/src/expr.rs:503-536, 550-564). Spark's `to_date` /
  * `to_timestamp` / `date_format` take Java patterns ("yyyy-MM-dd HH:mm:ss"),
  * so the user-facing API translates at the boundary.
  */
object ChronoFormat {
  private val mapping: Map[Char, String] = Map(
    'Y' -> "yyyy",   // full year
    'y' -> "yy",     // 2-digit year
    'm' -> "MM",     // month number
    'd' -> "dd",     // day of month
    'e' -> "d",      // day of month, space-padded -> closest: no pad
    'H' -> "HH",     // hour 00-23
    'I' -> "hh",     // hour 01-12
    'M' -> "mm",     // minute
    'S' -> "ss",     // second
    'f' -> "SSSSSS", // fractional (chrono %f = nanos; we map to micros width 6)
    'p' -> "a",      // AM/PM
    'b' -> "MMM",    // abbreviated month name
    'B' -> "MMMM",   // full month name
    'a' -> "EEE",    // abbreviated weekday
    'A' -> "EEEE",   // full weekday
    'j' -> "DDD",    // day of year
    'Z' -> "zzz",    // tz name
    'z' -> "xx",     // tz offset +0000
    'G' -> "YYYY",   // ISO week year
    'V' -> "ww",     // ISO week number
    'u' -> "e",      // ISO weekday 1-7
  )

  /** Translate a chrono/strftime pattern into a Java datetime pattern. */
  def toJava(chrono: String): String = {
    val out = new StringBuilder
    var i = 0
    while (i < chrono.length) {
      val c = chrono.charAt(i)
      if (c == '%' && i + 1 < chrono.length) {
        val spec = chrono.charAt(i + 1)
        if (spec == '%') out.append('%')
        else out.append(mapping.getOrElse(spec,
          throw new IllegalArgumentException(s"unsupported chrono specifier %$spec in '$chrono'")))
        i += 2
      } else if (c.isLetter) {
        // literal letters must be quoted in Java patterns
        out.append('\'').append(c)
        i += 1
        while (i < chrono.length && chrono.charAt(i).isLetter && chrono.charAt(i) != '%') {
          out.append(chrono.charAt(i)); i += 1
        }
        out.append('\'')
      } else {
        out.append(c); i += 1
      }
    }
    out.toString
  }
}
