package graft

import org.apache.spark.sql.DataFrame

/** Hand-computed fixtures for the Gopher-style quality battery
  * (d52 top-n-gram char fraction, d53 duplicated-n-gram coverage,
  * d54 quality gate) — every expected number derived on paper in the
  * comments, including the documented >1.0 overlap case and the
  * empty-document edge.
  */
class QualityOpsSpec extends SparkSpec {
  import spark.implicits._

  private lazy val dir: String = {
    val d = java.nio.file.Files
      .createTempDirectory("quality_fixture").toString
    Seq(
      // doc 0: "a b a b a b" — 6 words, text length 11
      //   2-grams: [a b, b a, a b, b a, a b] → top ("a b", 3),
      //     frac = 3·3/11; every 2-gram occurs ≥ 2 → full coverage
      //   3-grams: [a b a, b a b, a b a, b a b] → tie at 2, smallest
      //     "a b a", frac = 2·5/11
      //   4-grams: [a b a b, b a b a, a b a b] → ("a b a b", 2),
      //     frac = 2·7/11 > 1.0 (overlapping occurrences both count)
      (0L, "a b a b a b", "en", "src1"),
      // doc 1: "the quick brown fox" × 15 — 60 words, length 299;
      //   top 2-gram ties at 15 (the quick / quick brown / brown fox;
      //   fox the is 14) → smallest "brown fox", frac = 15·9/299;
      //   gate: n_words 60 ∈ [50,1e5], mean_wlen (3+5+5+3)/4 = 4.0,
      //   n_stop = 15 ("the"), alpha 1.0 → passes
      (1L, Seq.fill(15)("the quick brown fox").mkString(" "), "en", "src1"),
      // doc 2: empty text — all-zero row, gram '' everywhere
      (2L, "", "en", "src2"),
      // doc 3: two words, no repeats, no stopwords
      (3L, "hello world", "en", "src2"))
      .toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars",
        org.apache.spark.sql.functions.length(
          org.apache.spark.sql.functions.col("text")).cast("long"))
      .coalesce(1)
      .write.mode("overwrite").parquet(s"$d/documents.parquet")
    d
  }

  private def run(name: String): Map[Long, org.apache.spark.sql.Row] =
    SparkEntry.queries(name)(spark, dir)
      .collect().map(r => r.getLong(0) -> r).toMap

  test("d52: top n-gram char fractions, ties to the smallest gram") {
    val m = run("d52_top_ngram_char_frac")
    val r0 = m(0L)
    assert(r0.getAs[String]("top2_gram") == "a b")
    assert(r0.getAs[Long]("top2_cnt") == 3L)
    assert(r0.getAs[Double]("top2_frac") == 3.0 * 3 / 11)
    assert(r0.getAs[String]("top3_gram") == "a b a")
    assert(r0.getAs[Double]("top3_frac") == 2.0 * 5 / 11)
    assert(r0.getAs[String]("top4_gram") == "a b a b")
    // overlap makes coverage exceed 1.0 — the periodicity signal
    assert(r0.getAs[Double]("top4_frac") == 2.0 * 7 / 11)
    assert(r0.getAs[Double]("top4_frac") > 1.0)
    val r1 = m(1L)
    assert(r1.getAs[String]("top2_gram") == "brown fox")
    assert(r1.getAs[Long]("top2_cnt") == 15L)
    assert(r1.getAs[Double]("top2_frac") == 15.0 * 9 / 299)
    val r2 = m(2L)
    assert(r2.getAs[String]("top2_gram") == "")
    assert(r2.getAs[Long]("top2_cnt") == 0L)
    assert(r2.getAs[Double]("top2_frac") == 0.0)
    val r3 = m(3L)
    assert(r3.getAs[String]("top2_gram") == "hello world")
    assert(r3.getAs[Double]("top2_frac") == 1.0)
  }

  test("d53: duplicated-gram coverage counts each word once") {
    val m = run("d53_dup_ngram_cover")
    val r0 = m(0L)
    // every 2-gram and 3-gram of doc 0 repeats → all 6 words covered
    assert(r0.getAs[Int]("dup2_grams") == 5)
    assert(r0.getAs[Int]("dup2_words") == 6)
    assert(r0.getAs[Double]("dup2_frac") == 1.0)
    assert(r0.getAs[Int]("dup3_grams") == 4)
    assert(r0.getAs[Double]("dup3_frac") == 1.0)
    // doc 1: every 2-gram occurs ≥ 14 times → full coverage too
    assert(m(1L).getAs[Double]("dup2_frac") == 1.0)
    // docs 2 and 3: no duplicated grams at all
    assert(m(2L).getAs[Int]("dup2_grams") == 0)
    assert(m(2L).getAs[Double]("dup2_frac") == 0.0)
    assert(m(3L).getAs[Int]("dup2_grams") == 0)
    assert(m(3L).getAs[Double]("dup3_frac") == 0.0)
  }

  test("d54: gate flags and the conjunction") {
    val m = run("d54_quality_gate")
    val r1 = m(1L)
    assert(r1.getAs[Long]("n_words") == 60L)
    assert(r1.getAs[Double]("mean_wlen") == 4.0)
    assert(r1.getAs[Long]("n_stop") == 15L)
    assert(r1.getAs[Double]("alpha_frac") == 1.0)
    assert(r1.getAs[Boolean]("passes"))
    val r0 = m(0L)
    assert(!r0.getAs[Boolean]("ok_words")) // 6 < 50
    assert(!r0.getAs[Boolean]("ok_mwl")) // mean 1.0 < 3
    assert(r0.getAs[Boolean]("ok_stop")) // "a" × 3
    assert(!r0.getAs[Boolean]("passes"))
    val r2 = m(2L)
    assert(r2.getAs[Long]("n_words") == 0L)
    assert(!r2.getAs[Boolean]("passes"))
    val r3 = m(3L)
    assert(r3.getAs[Boolean]("ok_mwl")) // mean 5.0
    assert(!r3.getAs[Boolean]("ok_stop")) // zero stopwords
    assert(!r3.getAs[Boolean]("passes"))
  }

  test("quality gate config: a rule variant is one constructor call; " +
      "the default reproduces d54 and the oracle is generated from " +
      "the same instance") {
    import graft.queries.QualityOps
    // the shipped d54 IS the default config
    val viaDefault = QualityOps.qualityGateQuery(
      QualityOps.QualityGateConfig())(spark, dir)
      .orderBy("doc_id").collect().toSeq
    val viaQuery = SparkEntry.queries("d54_quality_gate")(spark, dir)
      .orderBy("doc_id").collect().toSeq
    assert(viaDefault == viaQuery)

    // a loose C4-ish variant: short docs allowed, no stopword rule,
    // alpha floor halved — doc 3 ("hello world") flips to passing,
    // doc 0 (mean word length 1.0) passes the widened length band,
    // the empty doc 2 still fails on the word-count floor
    val loose = QualityOps.QualityGateConfig(
      minWords = 2L, maxWords = 100L,
      minMeanWordLen = 1.0, maxMeanWordLen = 20.0,
      minStopwordHits = 0L, minAlphaFrac = 0.5)
    val m = QualityOps.qualityGateQuery(loose)(spark, dir)
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(m(3L).getAs[Boolean]("passes"))
    assert(m(0L).getAs[Boolean]("passes"))
    assert(!m(2L).getAs[Boolean]("passes"))
    assert(m(1L).getAs[Boolean]("ok_stop")) // 0-hit floor: always ok

    // the generated oracle carries the variant's constants — one
    // source of truth for both engines
    val sql = QualityOps.qualityGateSql(loose)
    assert(sql.contains("n_words >= 2 AND n_words <= 100"))
    assert(sql.contains("mean_wlen >= 1.0 AND mean_wlen <= 20.0"))
    assert(sql.contains("n_stop >= 0") && sql.contains(
      "alpha_frac >= 0.5"))
    // and the default-config oracle is byte-identical to what the
    // driver's correctness gate runs for d54
    assert(QualityOps.qualityGateSql(QualityOps.QualityGateConfig()) ==
      SparkEntry.oracleSql("d54_quality_gate"))
  }

  test("d55: wide Gopher widths — periodic doc fully covered, short " +
      "docs all-zero") {
    val m = run("d55_dup_ngram_cover_wide")
    // doc 1 repeats a 4-word phrase 15×: every n-gram for n ≤ 56 has a
    // twin 4 positions away, so all six widths reach full coverage
    val r1 = m(1L)
    for (n <- 5 to 10) {
      assert(r1.getAs[Double](s"dup${n}_frac") == 1.0, s"doc1 n=$n")
      // period 4 ⇒ grams sharing a start residue mod 4 are equal, and
      // every residue class has ≥ 12 members here, so ALL 60-n+1
      // grams are duplicated
      assert(r1.getAs[Int](s"dup${n}_grams") == 60 - n + 1,
        s"doc1 n=$n grams")
    }
    // doc 0 has 6 words: 5-grams are the two distinct halves (no dup),
    // 6-gram unique, 7..10 empty — all zero
    val r0 = m(0L)
    for (n <- 5 to 10) {
      assert(r0.getAs[Int](s"dup${n}_grams") == 0, s"doc0 n=$n")
      assert(r0.getAs[Double](s"dup${n}_frac") == 0.0)
    }
    assert(m(2L).getAs[Double]("dup10_frac") == 0.0)
    assert(m(3L).getAs[Int]("dup5_grams") == 0)
  }

  test("fused DupCover kernel ≡ the r14 sort+fold formulation on " +
      "hostile inputs") {
    // a third corpus, nastier than the fixture: mixed whitespace runs
    // (tab/LF/CR — the kernel's \s contract), astral-plane code points
    // (length() counts CODE POINTS, not UTF-16 units), a non-breaking
    // space (NOT \s: token content, both sides alike), exactly-n and
    // n-1 token docs, a 3-periodic doc, and a null text row
    val d = java.nio.file.Files
      .createTempDirectory("dupcover_hostile").toString
    Seq(
      (0L, "x\ty  x\ny \r x y z", "en", "s"),
      (1L, "😀 a 😀 a 😀 a", "en", "s"),
      (2L, "p q p q r", "en", "s"),
      (3L, "one two three", "en", "s"),
      (4L, "w w", "en", "s"),
      (5L, "r s t r s t r s t r s t", "en", "s"),
      (6L, null.asInstanceOf[String], "en", "s"),
      (7L, "   \t \n  ", "en", "s"))
      .toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars", org.apache.spark.sql.functions
        .coalesce(org.apache.spark.sql.functions.length(
          org.apache.spark.sql.functions.col("text")),
          org.apache.spark.sql.functions.lit(0L))
        .cast("long"))
      .coalesce(1)
      .write.mode("overwrite").parquet(s"$d/documents.parquet")
    for (ns <- Seq(Seq(2, 3), (5 to 10): Seq[Int], Seq(1, 2, 3))) {
      val fused = queries.QualityOps.dupCoverQueryFused(ns)(spark, d)
        .orderBy("doc_id").collect().toSeq
      val sorted = queries.QualityOps.dupCoverQuerySorted(ns)(spark, d)
        .orderBy("doc_id").collect().toSeq
      assert(fused == sorted, s"widths $ns")
    }
    // the d52 mode kernel on the same hostile corpus — tie-breaking
    // included (doc 5 is 3-periodic: every width has count ties)
    for (ns <- Seq(Seq(2, 3, 4), Seq(1, 5))) {
      val fused = queries.QualityOps.topGramQueryFused(ns)(spark, d)
        .orderBy("doc_id").collect().toSeq
      val sorted = queries.QualityOps.topGramQuerySorted(ns)(spark, d)
        .orderBy("doc_id").collect().toSeq
      assert(fused == sorted, s"top-gram widths $ns")
    }
  }

  test("gatePassing: exactly gateFlags' passing set, rider columns " +
      "ride through, and the plan is exchange- and join-free " +
      "(VERDICT r18 Next #3)") {
    import graft.queries.QualityOps
    val cfg = QualityOps.QualityGateConfig()
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .withColumn("rider",
        org.apache.spark.sql.functions.concat_ws("#",
          org.apache.spark.sql.functions.col("lang"),
          org.apache.spark.sql.functions.col("source")))
    val inPlace = QualityOps.gatePassing(docs, "doc_id", "text", cfg)
    // same schema as the input — riders intact, no helper column
    assert(inPlace.columns.toSeq == docs.columns.toSeq)
    // same survivors as the flags face
    val viaFlags = QualityOps.gateFlags(docs, "doc_id", "text", cfg)
      .filter(org.apache.spark.sql.functions.col("passes"))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val got = inPlace.select("doc_id", "rider").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    assert(got.map(_._1).toSet == viaFlags)
    assert(got.forall { case (_, rider) => rider.contains("#") })
    // zero exchanges, zero joins: scan → tokenize → filter
    val p = inPlace.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert("\\(\\d+\\) Exchange".r.findAllIn(p).isEmpty,
      s"gatePassing must not shuffle:\n${p.take(500)}")
    assert(!p.contains("Join"), "gatePassing must not join")
  }

  test("all four are shuffle-free map-side projections") {
    for (q <- Seq("d52_top_ngram_char_frac", "d53_dup_ngram_cover",
        "d54_quality_gate", "d55_dup_ngram_cover_wide")) {
      val p = SparkEntry.queries(q)(spark, dir)
        .queryExecution.explainString(
          org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
      assert("\\(\\d+\\) Exchange".r.findAllIn(p).isEmpty,
        s"$q must not shuffle:\n${p.take(500)}")
      assert(!p.contains("Join"), s"$q must not join")
    }
  }
}
