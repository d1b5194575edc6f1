package graft

import org.apache.spark.sql.functions._

import graft.prep.Prep

/** C4 line/page quality rules ([[graft.prep.Prep.c4Clean]], Raffel et al.
  * 2020 §2.2). */
class C4CleanSpec extends SparkSpec {
  import spark.implicits._

  private def clean(texts: (Long, String)*) =
    Prep.c4Clean(texts.toDF("id", "text"), "text")
      .select("id", "n_kept_lines", "keep", "kept_text")
      .collect().map(r => r.getLong(0) -> ((r.getInt(1), r.getBoolean(2), r.getString(3)))).toMap

  test("line rules: terminal punctuation, word floor, javascript blocklist") {
    val doc =
      "good first sentence here.\n" + // kept
        "no terminal punctuation\n" + // dropped: no . ! ? "
        "too short.\n" + // dropped: 2 words
        "enable javascript to continue.\n" + // dropped: blocklist
        "ends with a question?\n" + // kept
        "quoted line ends well.\"" // kept (quote terminal)
    val (n, keep, kept) = clean((1L, doc))(1L)
    assert(n == 3 && keep)
    assert(kept == "good first sentence here.\nends with a question?\nquoted line ends well.\"")
  }

  test("page rules: lorem ipsum, curly brace, minimum surviving lines") {
    val base = "one good line here.\nsecond good line here.\nthird good line here."
    val got = clean(
      (1L, base),
      (2L, base + "\nlorem ipsum dolor sit."),
      (3L, base + "\nvar x = { y };"),
      (4L, "only one good line here."))
    assert(got(1L)._2 === true)
    assert(got(2L)._2 === false, "lorem ipsum page must drop")
    assert(got(3L)._2 === false, "curly-brace page must drop")
    assert(got(4L)._1 == 1 && got(4L)._2 === false, "below minLines must drop")
  }

  test("rows are flagged, never dropped; empty text flagged false") {
    val got = clean((1L, ""), (2L, "a good line survives here."))
    assert(got.size == 2)
    assert(got(1L) == ((0, false, "")))
  }

  test("word floor counts words, not characters (multi-space robust)") {
    val got = clean((1L, "a  b   ok.\nw x y z."))
    // line 1 has 3 words >= 3 -> kept; line 2 has 4 words -> kept
    assert(got(1L)._1 == 2)
  }

  test("native one-pass expression == lambda formulation (400 random docs)") {
    // the declarative tree C4KeepLinesExpr replaced, verbatim
    def lambdaClean(df: org.apache.spark.sql.DataFrame, minWords: Int) = {
      val lines = split(col("text"), "\n")
      val kept = filter(lines, l =>
        substring(l, -1, 1).isin(".", "!", "?", "\"") &&
          size(filter(split(l, "\\s+"), w => w =!= "")) >= minWords &&
          !lower(l).contains("javascript"))
      df.select(col("id"), array_join(kept, "\n").as("kept_text"),
        size(kept).as("n_kept_lines"))
    }
    val rnd = new scala.util.Random(20260813)
    val frags = Array("word", "ok.", "?", "\"", "!", "", " ", "  ", "\t", "\r",
      "", "\f", "JavaScript", "JAVASCRIPT", "javascripX", "İ", "K",
      "javascrİpt", "ssß.", "end.", "..", "a", "xy z.", "été.")
    val docs = (1L to 400L).map { id =>
      val nLines = rnd.nextInt(8)
      val text = Seq.fill(nLines)(
        Seq.fill(rnd.nextInt(7))(frags(rnd.nextInt(frags.length))).mkString(" ")
      ).mkString("\n")
      (id, if (id % 97 == 0) null else text)
    }
    val df = docs.toDF("id", "text")
    for (minWords <- Seq(0, 1, 3)) {
      val native = Prep.c4Clean(df, "text", minWordsPerLine = minWords)
        .select("id", "kept_text", "n_kept_lines")
        .collect().map(r => r.getLong(0) -> ((r.get(1), r.get(2)))).toMap
      val lambda = lambdaClean(df, minWords)
        .collect().map(r => r.getLong(0) -> ((r.get(1), r.get(2)))).toMap
      assert(native === lambda, s"minWords=$minWords")
    }
  }
}
