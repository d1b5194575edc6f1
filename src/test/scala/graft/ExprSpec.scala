package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.Row
import graft.api.syntax._

/** Golden-value expression tests mirroring the reference's ExprTests
  * (Polars.CSharp.Tests/ExprTests.cs; fixtures FIXTURES.md F4/F5/F7). */
class ExprSpec extends SparkSpec {
  import spark.implicits._

  test("string ops: case, slice, replace, extract, strip (F7)") {
    val df = Seq("  Hello World  ", "http://example.com/page", "Brand#42 item")
      .toDF("raw")
    val got = df.select(
      col("raw").str.toUppercase.as("up"),
      col("raw").str.stripChars().as("stripped"),
      col("raw").str.stripPrefix("http://").as("noproto"),
      col("raw").str.extract("Brand#(\\d+)", 1).as("brand"),
      col("raw").str.slice(2, 5).as("sliced"),
      col("raw").str.replaceAll("o", "0", useRegex = false).as("zeroed"),
    ).collect()
    assert(got(0).getString(0) == "  HELLO WORLD  ")
    assert(got(0).getString(1) == "Hello World")
    assert(got(1).getString(2) == "example.com/page")
    assert(got(2).getString(3) == "42")
    assert(got(0).getString(4) == "Hello")
    assert(got(1).getString(5) == "http://example.c0m/page".replace("o", "0") || got(1).getString(5) == "http://example.com/page".replace("o", "0"))
  }

  test("string to_date with chrono format; null on parse failure") {
    val df = Seq("2024-01-15", "not a date").toDF("s")
    val got = df.select(col("s").str.toDate("%Y-%m-%d").as("d")).collect()
    assert(got(0).getDate(0).toString == "2024-01-15")
    assert(got(1).isNullAt(0))
  }

  test("dt.to_string: ISO week, space-padded, epoch and composite specifiers (expr.rs:550-564)") {
    // Spark bans Java week-based pattern letters (ww/YYYY/e), so these
    // compile to expressions; pin chrono's documented outputs.
    // 2021-01-01 is a Friday in ISO week 53 of week-year 2020.
    val df = Seq(java.sql.Timestamp.valueOf("2021-01-01 09:05:07")).toDF("ts")
    def f(fmt: String): String =
      df.select(col("ts").dt.toString(fmt)).collect()(0).getString(0)
    assert(f("%G-W%V-%u") == "2020-W53-5")
    assert(f("%g|%w|%C") == "20|5|20")
    assert(f("[%e][%k][%l]%P") == "[ 1][ 9][ 9]am")    // space-padded + lowercase am/pm
    assert(f("%s") == "1609491907")                     // epoch seconds, session TZ UTC
    assert(f("%F %T") == "2021-01-01 09:05:07")         // composites
    assert(f("%r") == "09:05:07 AM")
    assert(f("%Y-%m-%dT%H:%M:%S") == "2021-01-01T09:05:07") // literal T quoting
    // Monday Dec 28 2026 stays in ISO week 53 of its OWN year
    val mon = Seq(java.sql.Timestamp.valueOf("2026-12-28 00:00:00")).toDF("ts")
    assert(mon.select(col("ts").dt.toString("%G-W%V-%u|%l%P")).collect()(0).getString(0)
      == "2026-W53-1|12am")
    // parse direction still rejects non-parseable specifiers
    intercept[IllegalArgumentException](graft.functions.ChronoFormat.toJava("%V"))
    assert(graft.functions.ChronoFormat.toJava("%F") == "yyyy-MM-dd")
  }

  test("parse direction: space-padded %e/%k/%l and the %y century rule (ADVICE r10)") {
    // chrono parses %e (space-padded day) as a plain numeric field; the
    // Java translation is an optional-pad section, accepting " 5" and "15"
    val days = Seq(" 5-Jan-2020", "15-Jan-2020", "5-Jan-2020").toDF("s")
    val d = days.select(col("s").str.toDate("%e-%b-%Y").as("d")).collect()
    assert(d(0).getDate(0).toString == "2020-01-05")
    assert(d(1).getDate(0).toString == "2020-01-15")
    assert(d(2).getDate(0).toString == "2020-01-05")
    // %v composite = %e-%b-%Y, %c embeds %e and %k/%l parse via the same path
    val v = Seq(" 7-Feb-1999").toDF("s")
      .select(col("s").str.toDate("%v").as("d")).collect()
    assert(v(0).getDate(0).toString == "1999-02-07")
    val kl = Seq("2021-01-01  9:05").toDF("s")
      .select(col("s").str.toDatetime("%Y-%m-%d %k:%M").as("t")).collect()
    assert(kl(0).getTimestamp(0).toString == "2021-01-01 09:05:00.0")
    // %y alone: C century rule (69-99 -> 19xx)
    val y = Seq("75-03-01", "25-03-01").toDF("s")
      .select(col("s").str.toDate("%y-%m-%d").as("d")).collect()
    assert(y(0).getDate(0).toString == "1975-03-01")
    assert(y(1).getDate(0).toString == "2025-03-01")
    // mixed %Y + %y: the full-year field resolves the year — no shift
    val mixed = Seq("2075 75").toDF("s")
      .select(col("s").str.toDate("%Y %y").as("d")).collect()
    assert(mixed(0).getDate(0).toString == "2075-01-01")
  }

  test("temporal components: weekday is 1-7 Monday-based (expr.rs:251)") {
    // 2024-01-01 is a Monday
    val df = Seq(java.sql.Timestamp.valueOf("2024-01-01 13:45:30")).toDF("ts")
    val got = df.select(
      col("ts").dt.year, col("ts").dt.month, col("ts").dt.day,
      col("ts").dt.weekday, col("ts").dt.hour, col("ts").dt.ordinalDay).collect()(0)
    assert(got.getInt(0) == 2024 && got.getInt(1) == 1 && got.getInt(2) == 1)
    assert(got.getInt(3) == 1) // Monday = 1
    assert(got.getInt(4) == 13 && got.getInt(5) == 1)
  }

  test("dt truncate/round/offset on arbitrary durations") {
    val df = Seq(java.sql.Timestamp.valueOf("2024-03-15 10:22:45")).toDF("ts")
    val got = df.select(
      col("ts").dt.truncate("15m").cast("string"),
      col("ts").dt.round("1h").cast("string"),
      col("ts").dt.offsetBy("90m").cast("string")).collect()(0)
    assert(got.getString(0) == "2024-03-15 10:15:00")
    assert(got.getString(1) == "2024-03-15 10:00:00")
    assert(got.getString(2) == "2024-03-15 11:52:45")
  }

  test("list namespace: get/sort/contains/join/len/sum/mean (F4)") {
    val df = Seq((1, Seq(3L, 1L, 2L)), (2, Seq(10L, 20L, 30L))).toDF("id", "xs")
    val got = df.orderBy("id").select(
      col("xs").list.get(0), col("xs").list.get(-1),
      col("xs").list.sort(descending = true),
      col("xs").list.contains(lit(2L)),
      col("xs").list.join(","),
      col("xs").list.len, col("xs").list.sumLong, col("xs").list.mean).collect()
    assert(got(0).getLong(0) == 3L && got(0).getLong(1) == 2L)
    assert(got(0).getSeq[Long](2) == Seq(3L, 2L, 1L))
    assert(got(0).getBoolean(3) && !got(1).getBoolean(3))
    assert(got(1).getString(4) == "10,20,30")
    assert(got(0).getInt(5) == 3 && got(1).getLong(6) == 60L)
    assert(got(1).getDouble(7) == 20.0)
  }

  test("list.get out of bounds is null, not error (expr.rs:744-754)") {
    val df = Seq(Seq(1, 2)).toDF("xs")
    val got = df.select(col("xs").list.get(5)).collect()(0)
    assert(got.isNullAt(0))
  }

  test("struct namespace: as_struct, field access, json_encode (F4)") {
    val df = Seq(("alice", 30)).toDF("name", "age")
    val got = df.select(
      asStruct(col("name"), col("age")).struct_.jsonEncode.as("j"),
      asStruct(col("name").as("n"), col("age").as("a")).struct_.fieldByName("n").as("f"))
      .collect()(0)
    assert(got.getString(0) == """{"name":"alice","age":30}""")
    assert(got.getString(1) == "alice")
  }

  test("struct field_by_index and rename_fields via frame schema (expr.rs:932-982)") {
    import graft.api.frame._
    val df = Seq(("alice", 30)).toDF("name", "age")
      .select(struct(col("name"), col("age")).as("p"))
    val byIdx = df.select(df.structFieldByIndex("p", 1)).collect()(0)
    assert(byIdx.getInt(0) == 30)
    val renamed = df.renameStructFields("p", "n", "a")
    assert(renamed.schema("p").dataType.asInstanceOf[org.apache.spark.sql.types.StructType]
      .fieldNames.toSeq == Seq("n", "a"))
    assert(renamed.select(col("p").struct_.jsonEncode).collect()(0).getString(0) ==
      """{"n":"alice","a":30}""")
  }

  test("logBase matches log(base, x)") {
    val df = Seq(8.0).toDF("x")
    assert(df.select(col("x").logBase(2.0)).collect()(0).getDouble(0) == 3.0)
  }

  test("fillNull/fillNan/ifElse/isBetween/floorDiv") {
    val df = Seq[(java.lang.Double, java.lang.Double)]((null, 1.0), (Double.NaN, 2.0), (7.0, 2.0))
      .toDF("a", "b")
    val got = df.select(
      col("a").fillNull(lit(-1.0)),
      col("a").fillNan(lit(-2.0)),
      ifElse(col("b") > 1.5, lit("big"), lit("small")),
      col("b").isBetween(lit(1.0), lit(2.0)),
      col("a").floorDiv(col("b"))).collect()
    assert(got(0).getDouble(0) == -1.0)
    assert(got(1).getDouble(1) == -2.0)
    assert(got(0).getString(2) == "small" && got(1).getString(2) == "big")
    assert(got(0).getBoolean(3) && got(1).getBoolean(3))
    assert(got(2).getLong(4) == 3L)
  }

  test("castLenient gives null on bad cast; castStrict keeps valid casts") {
    val df = Seq("12", "oops").toDF("s")
    val got = df.select(col("s").castLenient("int")).collect()
    assert(got(0).getInt(0) == 12 && got(1).isNullAt(0))
  }

  test("castStrict raises on unparseable/overflow; lenient nulls (expr.rs:1015-1033)") {
    // strict: valid values pass through
    val ok = Seq("12", "34").toDF("s").select(col("s").castStrict("int")).collect()
    assert(ok.map(_.getInt(0)).toSeq == Seq(12, 34))
    // strict: malformed string raises (SparkNumberFormatException et al.
    // implement SparkThrowable without extending SparkException)
    intercept[org.apache.spark.SparkThrowable] {
      Seq("oops").toDF("s").select(col("s").castStrict("int")).collect()
    }
    // strict: integer overflow raises — even with session ANSI off
    spark.conf.set("spark.sql.ansi.enabled", "false")
    try {
      intercept[org.apache.spark.SparkThrowable] {
        Seq(1000).toDF("n").select(col("n").castStrict("tinyint")).collect()
      }
      // and the lenient twin still nulls under the same config
      val l = Seq(1000, 7).toDF("n").select(col("n").castLenient("tinyint")).collect()
      assert(l(0).isNullAt(0) && l(1).getByte(0) == 7.toByte)
    } finally spark.conf.unset("spark.sql.ansi.enabled")
  }

  test("shift/diff expr helpers match lag composition (expr.rs:1035-1062)") {
    import org.apache.spark.sql.expressions.Window
    val df = Seq(("a", 1, 10.0), ("a", 2, 13.0), ("a", 3, 11.0), ("b", 1, 5.0), ("b", 2, 9.0))
      .toDF("g", "i", "v")
    val w = Window.partitionBy("g").orderBy("i")
    val got = df.select(col("g"), col("i"),
        col("v").shift(1, w).as("prev"),
        col("v").shift(-1, w).as("next"),
        col("v").diff(1, w).as("d"))
      .orderBy(col("g"), col("i")).collect()
    assert(got(0).isNullAt(2) && got(1).getDouble(2) == 10.0)     // shift(1)
    assert(got(0).getDouble(3) == 13.0 && got(2).isNullAt(3))     // shift(-1)
    assert(got(1).getDouble(4) == 3.0 && got(2).getDouble(4) == -2.0) // diff
    assert(got(3).isNullAt(2) && got(4).getDouble(4) == 4.0)      // partition reset
  }

  test("replace_time_zone DST policies: ambiguous earliest/latest/null/raise, gap null/raise (expr.rs:658-700)") {
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    // Europe/Berlin 2024: clocks fall back 03:00->02:00 on Oct 27 (02:30 is
    // ambiguous); spring forward 02:00->03:00 on Mar 31 (02:30 doesn't exist)
    val amb = Seq(ts("2024-10-27 02:30:00")).toDF("t")
    def instant(df: org.apache.spark.sql.DataFrame): Long =
      df.select(unix_micros(col("r"))).head().getLong(0)
    val early = instant(amb.withColumn("r", col("t").dt.replaceTimeZone("Europe/Berlin", ambiguous = "earliest")))
    val late = instant(amb.withColumn("r", col("t").dt.replaceTimeZone("Europe/Berlin", ambiguous = "latest")))
    assert(late - early == 3600L * 1000000L, "latest is exactly one hour after earliest")
    assert(early == java.time.Instant.parse("2024-10-27T00:30:00Z").toEpochMilli * 1000L)
    assert(amb.withColumn("r", col("t").dt.replaceTimeZone("Europe/Berlin", ambiguous = "null"))
      .select("r").head().isNullAt(0))
    val eAmb = intercept[Exception] {
      amb.withColumn("r", col("t").dt.replaceTimeZone("Europe/Berlin")).select("r").collect()
    }
    assert(eAmb.getMessage.contains("ambiguous") ||
      Option(eAmb.getCause).exists(_.getMessage.contains("ambiguous")))
    val gap = Seq(ts("2024-03-31 02:30:00")).toDF("t")
    assert(gap.withColumn("r", col("t").dt.replaceTimeZone("Europe/Berlin", nonExistent = "null"))
      .select("r").head().isNullAt(0))
    val eGap = intercept[Exception] {
      gap.withColumn("r", col("t").dt.replaceTimeZone("Europe/Berlin")).select("r").collect()
    }
    assert(eGap.getMessage.contains("does not exist") ||
      Option(eGap.getCause).exists(_.getMessage.contains("does not exist")))
    // unambiguous wall time resolves like to_utc_timestamp
    val plain = Seq(ts("2024-06-15 12:00:00")).toDF("t")
    val got = instant(plain.withColumn("r", col("t").dt.replaceTimeZone("Europe/Berlin")))
    val want = plain.select(unix_micros(to_utc_timestamp(col("t"), "Europe/Berlin"))).head().getLong(0)
    assert(got == want)
  }

  test("selectors resolve against schema with set algebra (SURVEY 2.12)") {
    import graft.api.{Selectors => S}
    import graft.api.frame._
    val df = Seq((1L, 2.0, "x", 3.0)).toDF("id", "sales_q1", "name_first", "sales_q2")
    assert(df.selectSel(S.startsWith("sales_")).columns.toSeq == Seq("sales_q1", "sales_q2"))
    assert(df.selectSel(S.numeric & !S.startsWith("sales_")).columns.toSeq == Seq("id"))
    assert(df.selectSel(S.all - S.byName("id")).columns.toSeq == Seq("sales_q1", "name_first", "sales_q2"))
    assert(df.selectSel(S.string | S.byName("id")).columns.toSeq == Seq("id", "name_first"))
    assert(df.selectSel(S.matches("q[12]$")).columns.toSeq == Seq("sales_q1", "sales_q2"))
  }
}
