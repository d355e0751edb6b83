package graft

import graft.cli.Main
import org.apache.spark.sql.functions._

/** End-to-end CLI curation funnel (VERDICT r17 Next #6): the exact
  * `Main -s curate` arg-parse → gate → dedup → split → decontam →
  * parquet path runs over fixture docs, asserting the per-stage counts,
  * the keep-first dedup winners, the no-leak output invariant (no train
  * doc contains a val/test survivor verbatim, word-aligned), and
  * byte-determinism across reruns (the split is content-hashed — no
  * RNG anywhere in the funnel).
  */
class CurateCliSpec extends SparkSpec {
  import spark.implicits._

  // 40 (contained, container) text pairs: the container embeds the
  // contained doc verbatim word-aligned, so whenever the hash split
  // sends a container to train and its contained text to val/test the
  // decontam stage MUST drop the container. Both pass the loosened
  // gate (>= 5 words, >= 2 stopwords, alpha >= 0.8).
  private val pairs = (0 until 40).map { i =>
    val inner = s"the quick brown fox number$i jumps over the lazy " +
      "dog and runs to the green hills in early spring"
    val outer = s"header words begin the document number$i then " +
      inner + " and trailing words conclude that same document"
    (inner, outer)
  }

  private def fixture(): String = {
    val rows =
      pairs.zipWithIndex.map { case ((inner, _), i) =>
        (100L + i, inner) } ++
      pairs.zipWithIndex.map { case ((_, outer), i) =>
        (200L + i, outer) } ++
      // exact duplicates of two contained docs — higher ids, so the
      // keep-first winners are 100/101
      Seq((300L, pairs(0)._1), (301L, pairs(1)._1)) ++
      // gate failures: too short / no stopwords
      Seq((400L, "too short"),
        (401L, "zero stopword tokens appear here whatsoever truly"))
    val dir = java.nio.file.Files
      .createTempDirectory("graft_curate_in").toString
    rows.toDF("doc_id", "text").write.mode("overwrite").parquet(dir)
    dir
  }

  private def runCurate(in: String, out: String)
      : (Map[String, Seq[String]], String) = {
    val buf = new java.io.ByteArrayOutputStream()
    val transcripts = Console.withOut(new java.io.PrintStream(buf)) {
      Main.run(spark, Array("-s", "curate", "-p", in, "-o", out,
        "--min-words", "5", "--max-words", "1000"))
    }
    (transcripts, buf.toString("UTF-8"))
  }

  test("curate: gate, dedup, split, decontam, parquet out — counts, " +
      "winners, no-leak invariant, printed transcript") {
    val in = fixture()
    val out = java.nio.file.Files
      .createTempDirectory("graft_curate_out").toString
    val (transcripts, printed) = runCurate(in, out)

    // transcript: the per-stage report, returned AND printed
    val lines = transcripts("curate")
    assert(printed.contains("-- curate"))
    assert(lines.exists(_.matches("input docs:\\s+84")))
    assert(lines.exists(_.matches("passed quality gate:\\s+82")),
      s"gate count off in:\n${lines.mkString("\n")}")
    assert(lines.exists(_.matches("after exact dedup:\\s+80")))

    val result = spark.read.parquet(out)
      .select(col("doc_id"), col("text"), col("split"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    // dedup winners: the duplicate ids are gone, their min-id
    // originals survive (they are contained docs, never containers,
    // so decontam cannot have dropped them)
    val ids = result.map(_._1).toSet
    assert(!ids.contains(300L) && !ids.contains(301L),
      "duplicate ids must lose keep-first election")
    assert(ids.contains(100L) && ids.contains(101L))
    // gate failures are out
    assert(!ids.contains(400L) && !ids.contains(401L))
    // every split value is canonical and all three strata exist on
    // this fixture (content-hashed — deterministic for these texts)
    assert(result.map(_._3).toSet == Set("train", "val", "test"))

    // the no-leak invariant the decontam stage exists to enforce:
    // no surviving train doc contains a surviving val/test doc
    // verbatim word-aligned
    val train = result.filter(_._3 == "train")
    val evals = result.filter(_._3 != "train")
    val leaks = for {
      (tid, tt, _) <- train
      (eid, et, _) <- evals
      if s" $tt ".contains(s" $et ")
    } yield (tid, eid)
    assert(leaks.isEmpty, s"leaky train docs survived: ${leaks.toSeq}")
    // and the stage actually FIRED on this fixture (a vacuous
    // invariant would prove nothing): some containers landed train
    // while their contained doc landed val/test, so the report counts
    // a drop and the written total is deduped minus exactly that
    val dropped = lines.find(_.startsWith("leaky train dropped:"))
      .map(_.split("\\s+").last.toLong).get
    assert(dropped >= 1L,
      "fixture must exercise the decontam drop; regenerate texts")
    assert(result.length.toLong == 80L - dropped)

    // determinism: a second run over the same input writes the exact
    // same (id, split) assignment — no RNG anywhere in the funnel
    val out2 = java.nio.file.Files
      .createTempDirectory("graft_curate_out2").toString
    runCurate(in, out2)
    val again = spark.read.parquet(out2)
      .select(col("doc_id"), col("split"))
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(again == result.map(t => (t._1, t._3)).toSet)
  }

  test("stage 1 is zero-shuffle: the gate filters the corpus in place " +
      "— no Exchange precedes the dedup stage (VERDICT r18 Next #3)") {
    val in = fixture()
    // the exact stage-1 frame Curate.run builds: gatePassing over the
    // raw input (the r18 shape semi-joined the full corpus back on id
    // purely to preserve rider columns — a corpus-wide shuffle)
    val gated = graft.queries.QualityOps.gatePassing(
      spark.read.parquet(in), "doc_id", "text",
      graft.queries.QualityOps.QualityGateConfig(
        minWords = 5L, maxWords = 1000L))
    val p = gated.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert("\\(\\d+\\) Exchange".r.findAllIn(p).isEmpty,
      s"the curate gate stage must not shuffle:\n${p.take(500)}")
    assert(!p.contains("Join"), "the curate gate stage must not join")
    assert(gated.count() == 82L) // the funnel's asserted stage-1 count
  }

  test("split percentages are validated: negative or >100 totals fail " +
      "fast instead of silently emptying a split (ADVICE r18)") {
    val in = fixture()
    val out = java.nio.file.Files
      .createTempDirectory("graft_curate_badpct").toString
    for ((t, v) <- Seq((80, 30), (-1, 10), (80, -1), (101, 0)))
      assert(intercept[IllegalArgumentException] {
        graft.pipelines.Curate.run(spark, in, out,
          trainPct = t, valPct = v)
      }.getMessage.contains("split percentages"))
  }
}
