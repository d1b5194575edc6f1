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

  // ---- sketch estimand properties (VERDICT r2 #6): the qd04/qd05 queries can
  // never hash-match a SQL oracle, so verify the statistical contract the
  // sketches are used for, by direct expression evaluation (no Spark jobs).

  import org.apache.spark.sql.catalyst.expressions.Literal
  import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
  import org.apache.spark.sql.types.{ArrayType, StringType}
  import org.apache.spark.unsafe.types.UTF8String

  private def utf8Arr(tokens: Seq[String]): ArrayData =
    new GenericArrayData(tokens.map(t => UTF8String.fromString(t): Any).toArray)
  private def minhash(tokens: Seq[String], k: Int): Array[Long] =
    graft.plans.MinHashSignatureExpr(Literal.create(null, ArrayType(StringType)), k)
      .nullSafeEval(utf8Arr(tokens)).asInstanceOf[ArrayData].toLongArray()
  private def simhash(tokens: Seq[String]): Long =
    graft.plans.SimHash64Expr(Literal.create(null, ArrayType(StringType)))
      .nullSafeEval(utf8Arr(tokens)).asInstanceOf[Long]
  private def hamming(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)

  private val tokenGen = Gen.listOfN(12, Gen.alphaNumChar).map(_.mkString)

  test("minhash is a SET signature: order- and multiplicity-invariant") {
    check(Prop.forAll(Gen.nonEmptyListOf(tokenGen)) { ts =>
      val k = 64
      minhash(ts, k).toSeq == minhash(scala.util.Random.shuffle(ts), k).toSeq &&
      minhash(ts ++ ts, k).toSeq == minhash(ts, k).toSeq
    })
  }

  test("minhash match-rate estimates exact Jaccard within a Chernoff band (k=256)") {
    val gen = for {
      a <- Gen.listOfN(120, tokenGen).map(_.distinct)
      keep <- Gen.choose(0, a.size)
      fresh <- Gen.listOfN(120 - keep, tokenGen.map("B" + _)).map(_.distinct)
    } yield (a.toSet, a.take(keep).toSet ++ fresh.toSet)
    check(Prop.forAll(gen) { case (a, b) =>
      val k = 256
      val exact = a.intersect(b).size.toDouble / a.union(b).size
      val (sa, sb) = (minhash(a.toSeq, k), minhash(b.toSeq, k))
      val est = sa.zip(sb).count { case (x, y) => x == y }.toDouble / k
      // stderr = sqrt(J(1-J)/k) <= 0.0313; 0.18 is ~5.8 sigma
      math.abs(est - exact) <= 0.18
    })
  }

  test("simhash: deterministic, order-invariant, far from independent content") {
    check(Prop.forAll(Gen.nonEmptyListOf(tokenGen)) { ts =>
      val fresh = ts.map("Z" + _)
      simhash(ts) == simhash(scala.util.Random.shuffle(ts)) &&
      hamming(simhash(ts), simhash(ts)) == 0 &&
      // independent token sets agree per bit w.p. 1/2: hamming >= 10 of 64
      // holds w.p. 1 - 3e-9 per case
      hamming(simhash(ts), simhash(fresh)) >= 10
    })
  }

  test("simhash hamming distance is monotone in token-set overlap (fixed-seed means)") {
    val rnd = new scala.util.Random(42)
    def doc() = Seq.fill(100)(rnd.alphanumeric.take(10).mkString)
    def meanHamming(overlap: Double): Double = {
      val trials = for (_ <- 1 to 200) yield {
        val a = doc()
        val kept = (a.size * overlap).toInt
        val b = a.take(kept) ++ Seq.fill(a.size - kept)("N" + rnd.alphanumeric.take(10).mkString)
        hamming(simhash(a), simhash(b))
      }
      trials.sum.toDouble / trials.size
    }
    val (h90, h50, h10) = (meanHamming(0.9), meanHamming(0.5), meanHamming(0.1))
    assert(h90 < h50 && h50 < h10, s"not monotone: 90%%=$h90 50%%=$h50 10%%=$h10")
    assert(h90 < 10 && h10 > 20, s"bands off: 90%%=$h90 10%%=$h10")
  }
}
