package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions

import scala.concurrent.{Await, ExecutionContext, Future, TimeoutException}
import scala.concurrent.duration._

/** Throughput floor for the map-side query family (VERDICT r13 Next
  * #3). The r13 `NewQueryPlanSpec` gate pinned SHUFFLE-freedom, and
  * d53 sailed through it while needing 56+ minutes for 5000 rows of
  * per-row interpreted-HOF work — "map-side" said nothing about CPU.
  * This suite closes that hole with two instruments:
  *
  *  1. A floor: each Gopher-battery query must push a synthetic
  *     WORST-CASE corpus (contract-max 100-word documents whose every
  *     n-gram is duplicated — maximal run lengths, maximal coverage
  *     arrays) through its projected plan at a minimum docs/s. The
  *     bound is ~20× looser than the measured cost of the shipped
  *     plans, and ~5× tighter than the retired r13 shape could ever
  *     reach, so it separates the classes under any CI noise.
  *  2. Detector validation (the BroadcastGateSpec pattern): the
  *     retired r13 d53 shape — `gs` referenced INSIDE the HOF lambdas,
  *     re-evaluating the whole shingle tree per element visit — is
  *     reconstructed verbatim here and must FAIL the bound on the
  *     same corpus, proving the gate would have caught commit 02ccbea
  *     before it shipped.
  *
  * Runs are bounded with a cancellable job group: a pathological plan
  * times out and is killed instead of hanging `sbt test` the way the
  * original defect hung the driver's bench.
  */
class MapSideFloorSpec extends SparkSpec {
  import spark.implicits._

  /** 2-word-alternation documents: every 2-gram and 3-gram occurs
    * >= 2 times, so duplicate-run buffers, flush copies and coverage
    * arrays are all maximal for the length. `words` is the corpus
    * contract maximum (documents are 10–99 words; see TESTDATA.md)
    * unless a test overrides it to magnify the separation.
    */
  private def worstCaseDir(nDocs: Int, words: Int): String = {
    val d = java.nio.file.Files
      .createTempDirectory(s"floor_${nDocs}x$words").toString
    val text = Array.tabulate(words)(i => if (i % 2 == 0) "aa" else "bb")
      .mkString(" ")
    spark.range(nDocs)
      .select(col("id").as("doc_id"), lit(text).as("text"),
        lit("en").as("lang"), lit("synth").as("source"),
        lit(text.length.toLong).as("n_chars"))
      .coalesce(4)
      .write.mode("overwrite").parquet(s"$d/documents.parquet")
    d
  }

  /** Executes `df`'s physical plan to completion (toRdd.count — the
    * noop-sink idiom: a bare df.count() would let Catalyst prune every
    * projection and "measure" a parquet row count) inside a
    * cancellable job group. Some(seconds) on completion within the
    * bound; None after cancelling the group on timeout.
    */
  private def runBounded(df: DataFrame, timeout: FiniteDuration)
      : Option[Double] = {
    val group = "floor-" + java.util.UUID.randomUUID().toString
    implicit val ec: ExecutionContext = ExecutionContext.global
    val sc = spark.sparkContext
    val f = Future {
      sc.setJobGroup(group, "map-side throughput floor probe",
        interruptOnCancel = true)
      try {
        val t0 = System.nanoTime()
        df.queryExecution.toRdd.count()
        (System.nanoTime() - t0) / 1e9
      } finally sc.clearJobGroup()
    }
    try Some(Await.result(f, timeout))
    catch {
      case _: TimeoutException =>
        sc.cancelJobGroup(group)
        None
    }
  }

  // ---- 1. the floor ------------------------------------------------

  // 3000 contract-max worst-case docs, 45 s bound at local[4] = a
  // 66 docs/s floor. Shipped plans measure ~1000+ docs/s here; the
  // retired shape measures < 5 docs/s at this length (cubic term):
  // the bound sits an order of magnitude from both.
  private val FloorDocs = 3000
  private val FloorBound = 45.seconds

  // the Gopher battery (the family that motivated the gate) plus every
  // other pure map-side projection over documents — each must clear
  // the same worst-case floor, so a future edit that re-introduces an
  // expression-re-evaluating HOF shape into ANY of them fails here
  for (q <- Seq("d52_top_ngram_char_frac", "d53_dup_ngram_cover",
      "d54_quality_gate", "d55_dup_ngram_cover_wide",
      "d03_quality_ratios", "d04_langid", "d05_fingerprint",
      "d13_quality_score", "d21_pii_redact")) {
    test(s"$q clears the worst-case throughput floor " +
        s"($FloorDocs max-length docs in ${FloorBound.toSeconds} s)") {
      val dir = worstCaseDir(FloorDocs, words = 100)
      val sec = runBounded(SparkEntry.queries(q)(spark, dir), FloorBound)
      assert(sec.isDefined,
        s"$q exceeded ${FloorBound.toSeconds} s on $FloorDocs worst-case " +
          "docs — per-row CPU is corpus-contract-pathological " +
          "(the d53/r13 defect class); inspect for expressions " +
          "re-evaluated inside HOF lambdas")
    }
  }

  // ---- 2. detector validation --------------------------------------

  /** The retired r13 d53 shape, reconstructed verbatim from commit
    * 02ccbea (QualityOps.scala:71-75 + the ts-in-lambda covChars):
    * `gs` and `ts` are full expression trees referenced inside HOF
    * lambdas, so interpreted evaluation re-computes tokenize +
    * zip_with shingling per element visit — O(m²) whole-document
    * re-evaluations per row, each O(m·k). Kept ONLY as detector
    * validation; never registered in SparkEntry.
    */
  private def retiredD53(docs: DataFrame): DataFrame = {
    val ts = TextFunctions.tokens(col("text"))
    // the r13 wordShingles was the HOF zip_with fold over the tokenize
    // TREE; the shipped wordShingles is a compiled kernel since r15, so
    // the reconstruction inlines the retired formulation to stay
    // byte-faithful to commit 02ccbea's evaluation shape
    def legacyWordShingles(c: Column, k: Int): Column = {
      val toks = TextFunctions.tokens(c)
      if (k <= 1) toks
      else {
        val joined = (1 until k).foldLeft(toks) { (acc, j) =>
          val shifted =
            slice(toks, lit(j + 1), greatest(size(toks) - j, lit(0)))
          zip_with(acc, shifted, (a, b) => concat(a, lit(" "), b))
        }
        filter(joined, x => x.isNotNull)
      }
    }
    def naiveDupStarts(gs: Column): Column =
      filter(
        when(size(gs) >= 1, sequence(lit(1), size(gs)))
          .otherwise(array().cast("array<int>")),
        i => size(filter(gs, x => x === element_at(gs, i))) >= 2)
    def cols(n: Int, p: String): Seq[Column] = {
      val gs = legacyWordShingles(col("text"), n)
      val starts = naiveDupStarts(gs)
      val covered = array_distinct(flatten(
        transform(starts, i => sequence(i, i + (n - 1)))))
      val covChars = aggregate(covered, lit(0L),
        (a, j) => a + length(element_at(ts, j)))
      val tot = aggregate(ts, lit(0L), (a, w) => a + length(w))
      Seq(size(starts).as(s"${p}_grams"),
        size(covered).as(s"${p}_words"),
        when(tot > 0, covChars.cast("double") / tot.cast("double"))
          .otherwise(lit(0.0)).as(s"${p}_frac"))
    }
    docs.select(col("doc_id") +: (cols(2, "dup2") ++ cols(3, "dup3")): _*)
  }

  test("detector validation: the retired r13 d53 shape FAILS the bound " +
      "the shipped shape clears on the identical corpus") {
    // 2× the contract length magnifies the cubic term so the retired
    // shape is minutes-slow (judge r13 measured >10 s/doc at HALF this
    // length) and the verdict is unambiguous inside a seconds-budget
    // spec; the shipped shape stays milliseconds-fast on the same rows.
    val dir = worstCaseDir(nDocs = 40, words = 200)
    val docs = Tables.load(spark, dir, "documents")
    val bound = 10.seconds
    val shipped = runBounded(
      SparkEntry.queries("d53_dup_ngram_cover")(spark, dir), bound)
    assert(shipped.isDefined,
      "shipped d53 must clear the bound on the shared detector corpus")
    val retired = runBounded(retiredD53(docs), bound)
    assert(retired.isEmpty,
      "the retired O(m^3) shape cleared the floor — the detector has " +
        "lost its teeth; tighten the bound or the corpus")
  }
}
