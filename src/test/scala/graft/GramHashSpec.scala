package graft

import graft.functions.GramHash
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => ScTest}

/** The compiled gram-hash kernel vs the HOF formulation it replaced:
  * `gram_hashes(text, L)` must be BIT-IDENTICAL to
  * `transform(sequence(1, n−L+1), p → xxhash64(substr(text, p, L)))`
  * — same positions, same 64-bit values — on hostile inputs (astral
  * code points, multi-byte UTF-8, whitespace runs, texts at exactly
  * L−1/L/L+1 code points). The xxhash64 compatibility is load-bearing:
  * stored `_gh` scrub indexes and folding tiers were built with the
  * HOF shape, and the kernel's probe rows must join them unchanged.
  */
class GramHashSpec extends SparkSpec {

  import spark.implicits._

  private def check(p: Prop): Unit = {
    val r = ScTest.check(
      ScTest.Parameters.default.withMinSuccessfulTests(200), p)
    assert(r.passed, r.status.toString)
  }

  private val hostileText: Gen[String] = {
    val piece = Gen.oneOf(
      Gen.stringOfN(5, Gen.alphaLowerChar),
      Gen.oneOf("", " ", "ab", "été noël", "日本語テキスト",
        new String(Character.toChars(0x1F600)) * 3,
        "a\tb\nc", "ééééééééé", "x" * 45))
    for {
      n <- Gen.choose(0, 12)
      ps <- Gen.listOfN(n, piece)
    } yield ps.mkString
  }

  private def hofHashes(texts: Seq[String], l: Int): Seq[Seq[Long]] = {
    val df = texts.toDF("t")
    df.select(
        when(length($"t") - (l - 1) <= 0, typedLit(Seq.empty[Long]))
          .otherwise(transform(
            sequence(lit(1), length($"t") - (l - 1)),
            p => xxhash64($"t".substr(p, lit(l))))).as("hs"))
      .as[Seq[Long]].collect().toSeq
  }

  private def kernelHashes(texts: Seq[String], l: Int): Seq[Seq[Long]] =
    texts.toDF("t")
      .select(GramHash.gramHashes($"t", l).as("hs"))
      .as[Seq[Long]].collect().toSeq

  test("gram_hashes ≡ xxhash64(substr) HOF on hostile unicode") {
    for (l <- Seq(1, 2, 7, 40)) {
      check(Prop.forAll(Gen.listOfN(8, hostileText)) { texts =>
        kernelHashes(texts, l) == hofHashes(texts, l)
      })
    }
  }

  test("gram_rows: strings match substr, hashes match xxhash64") {
    val texts = Seq("hello world, été & 日本語テキスト here",
      new String(Character.toChars(0x1F600)) * 10 + "tail",
      "x" * 12, "", "ab")
    val l = 7
    val rows = texts.toDF("t")
      .select($"t", posexplode(GramHash.gramRows($"t", l)).as(Seq("i", "r")))
      .select($"t", ($"i" + 1).as("p"), $"r.g", $"r.h")
      .collect()
    rows.foreach { r =>
      val t = r.getString(0); val p = r.getInt(1)
      val g = r.getString(2); val h = r.getLong(3)
      val expected = new String(
        t.codePoints().toArray.slice(p - 1, p - 1 + l), 0, l)
      assert(g == expected, s"gram at $p of '$t'")
      val viaSql = Seq(g).toDF("g").select(xxhash64($"g"))
        .as[Long].head()
      assert(h == viaSql, s"hash of '$g'")
    }
    // every eligible text contributes n−L+1 rows
    val byText = rows.groupBy(_.getString(0)).view.mapValues(_.length)
    texts.filter(t => t.codePointCount(0, t.length) >= l).foreach { t =>
      val n = t.codePoints().toArray.length
      assert(byText.getOrElse(t, 0) == n - l + 1)
    }
  }

  test("short and empty texts produce empty arrays") {
    val out = Seq("", "abc", "été").toDF("t")
      .select(GramHash.gramHashes($"t", 4).as("hs"))
      .as[Seq[Long]].collect()
    assert(out.forall(_.isEmpty))
  }

  test("rows: gram views survive mutation of an exactly-spanning " +
      "input buffer (ADVICE r16 — getBytes aliases the backing array)") {
    import org.apache.spark.unsafe.types.UTF8String
    // fromBytes over the WHOLE array: getBytes returns the array
    // itself (no copy) — the aliasing case a reused source buffer hits
    val buf = "abcdefgh".getBytes("UTF-8")
    val text = UTF8String.fromBytes(buf)
    val arr = GramHash.rows(text, 3)
    val grams = (0 until arr.numElements()).map(i =>
      arr.getStruct(i, 2).getUTF8String(0).toString)
    assert(grams == Seq("abc", "bcd", "cde", "def", "efg", "fgh"))
    // the data source reuses its buffer for the "next record"
    java.util.Arrays.fill(buf, 'z'.toByte)
    val after = (0 until arr.numElements()).map(i =>
      arr.getStruct(i, 2).getUTF8String(0).toString)
    assert(after == grams,
      "gram views must not alias a caller-owned buffer")
    // and the non-aliasing path (offset slice) still avoids per-gram
    // copies semantically: values match the hostile-unicode contract
    val slice = UTF8String.fromBytes("xxabcdefghxx".getBytes("UTF-8"), 2, 8)
    val arr2 = GramHash.rows(slice, 3)
    val grams2 = (0 until arr2.numElements()).map(i =>
      arr2.getStruct(i, 2).getUTF8String(0).toString)
    assert(grams2 == grams)
  }
}
