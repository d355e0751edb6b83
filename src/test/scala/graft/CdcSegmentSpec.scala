package graft

import graft.functions.CdcSegment
import org.scalacheck.{Gen, Prop, Test => ScTest}

/** The compiled segmentation kernel vs an INDEPENDENT Scala reference
  * (Java-regex tokenization + BigInt-free fold + explicit boundary
  * walk) on hostile inputs — tabs/CR/VT whitespace, multi-space runs,
  * leading/trailing whitespace, astral-plane code points, punctuation.
  * The kernel must be byte-identical to the column pipeline it
  * replaced; the DuckDB d48/d50 oracles pin the same semantics
  * cross-engine on the real corpus.
  */
class CdcSegmentSpec extends SparkSpec {

  private def check(p: Prop): Unit = {
    val r = ScTest.check(
      ScTest.Parameters.default.withMinSuccessfulTests(300), p)
    assert(r.passed, r.status.toString)
  }

  private def reference(text: String, divisor: Int): Seq[(Long, String)] = {
    val toks = text.trim.split("\\s+").filter(_.nonEmpty)
    if (toks.isEmpty) return Seq.empty
    def fold(t: String): Long = {
      var h = 0L
      t.codePoints().toArray.foreach(cp => h = (h * 31 + cp) % 1000000007L)
      h
    }
    val opens = toks.indices.map(i => i == 0 || fold(toks(i)) % divisor == 0)
    val starts = toks.indices.filter(opens)
    starts.zipWithIndex.map { case (s, j) =>
      val e = if (j + 1 < starts.length) starts(j + 1) else toks.length
      ((s + 1).toLong, toks.slice(s, e).mkString(" "))
    }
  }

  private val hostileText: Gen[String] = {
    val token = Gen.oneOf(
      Gen.stringOfN(3, Gen.alphaLowerChar),
      Gen.oneOf("a", "ab", "xyzzy", "42", "a-b!", "été",
        new String(Character.toChars(0x1F600)), "....", "k9"))
    val sep = Gen.oneOf(" ", "  ", "\t", "\n", " \t ", "\r\n")
    for {
      n <- Gen.choose(0, 40)
      toks <- Gen.listOfN(n, token)
      seps <- Gen.listOfN(n + 1, sep)
      lead <- Gen.oneOf("", " ", "\t\t")
    } yield lead + toks.zip(seps).map { case (t, s) => t + s }.mkString
  }

  test("kernel matches the independent reference on hostile text") {
    check(Prop.forAll(hostileText, Gen.oneOf(2, 3, 16)) { (text, d) =>
      CdcSegment.segmentsRef(text, d) == reference(text, d)
    })
  }

  test("edge cases: empty, whitespace-only, single token") {
    for (d <- Seq(2, 16)) {
      assert(CdcSegment.segmentsRef("", d).isEmpty)
      assert(CdcSegment.segmentsRef(" \t\n ", d).isEmpty)
      assert(CdcSegment.segmentsRef("solo", d) == Seq((1L, "solo")))
    }
  }

  test("segment texts re-join to the normalized token stream") {
    check(Prop.forAll(hostileText) { text =>
      val segs = CdcSegment.segmentsRef(text, 16)
      val toks = text.trim.split("\\s+").filter(_.nonEmpty)
      segs.map(_._2).mkString(" ") == toks.mkString(" ") &&
        (segs.isEmpty ||
          (segs.head._1 == 1L &&
            segs.map(_._1) == segs.map(_._1).sorted &&
            segs.map(_._1).distinct == segs.map(_._1)))
    })
  }

  test("the expression runs inside whole-stage codegen") {
    // a parquet-backed frame (a local Seq constant-folds to
    // LocalTableScan and proves nothing about doGenCode)
    val df = Tables.load(spark, "/root/testdata/sf0.001", "documents")
      .select(org.apache.spark.sql.functions.col("doc_id"),
        CdcSegment.cdcSegments(
          org.apache.spark.sql.functions.col("text"), 16).as("segs"))
    val p = df.queryExecution.executedPlan.toString
    // the "*(n)" prefix marks a WholeStageCodegen span containing the
    // projection that evaluates cdc_segments
    assert("\\*\\(\\d+\\) Project .*cdc_segments".r.findFirstIn(p).isDefined, p)
    assert(df.collect().nonEmpty)
  }
}
