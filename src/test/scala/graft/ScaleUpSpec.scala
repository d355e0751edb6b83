package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._

/** Contract of the scale-up synthesizer (STATUS r8 scale probe): k× volume
  * with the SAME distribution — shifted keys never collide across copies,
  * the text bijection preserves token structure, and copy 0 is verbatim.
  */
class ScaleUpSpec extends SparkSpec {
  private val src = "/root/testdata/sf0.001"

  private lazy val out: String = {
    val dir = Files.createTempDirectory("graft_scaleup").toString
    ScaleUp.run(spark, src, dir, k = 3)
    dir
  }

  test("every scaled table has exactly k x the source rows; dims unscaled") {
    val scaled = Seq("customer", "supplier", "part", "orders", "lineitem",
      "events", "documents", "embeddings")
    for (t <- scaled) {
      val n0 = Tables.load(spark, src, t).count()
      val n1 = Tables.load(spark, out, t).count()
      assert(n1 === 3 * n0, s"table $t")
    }
    for (t <- Seq("region", "nation"))
      assert(Tables.load(spark, out, t).count() ===
        Tables.load(spark, src, t).count(), s"dim $t")
  }

  test("shifted keys are globally unique (no cross-copy collision)") {
    for ((t, c) <- Seq("orders" -> "o_orderkey", "customer" -> "c_custkey",
      "documents" -> "doc_id", "embeddings" -> "vec_id",
      "events" -> "event_id")) {
      val df = Tables.load(spark, out, t)
      assert(df.select(c).distinct().count() === df.count(), s"$t.$c")
    }
  }

  test("referential integrity survives the shift (orders->customer)") {
    val orphans = Tables.load(spark, out, "orders").join(
      Tables.load(spark, out, "customer"),
      col("o_custkey") === col("c_custkey"), "left_anti").count()
    assert(orphans === 0L)
  }

  test("text bijection preserves length and intra-copy equality; copy 0 verbatim") {
    val src0 = Tables.load(spark, src, "documents")
      .select("doc_id", "text")
    val docs = Tables.load(spark, out, "documents")
    // copy 0 occupies the original key range and must be byte-identical
    val stride = src0.agg(max("doc_id")).head().getLong(0) + 1L
    val copy0Diff = docs.filter(col("doc_id") < stride)
      .select("doc_id", "text")
      .exceptAll(src0).count()
    assert(copy0Diff === 0L)
    // every copy preserves each doc's text length exactly (bijective
    // char substitution): same length histogram per copy as the source
    val srcHist = src0.groupBy(length(col("text")).as("len")).count()
    for (i <- 1 until 3) {
      val copyHist = docs
        .filter(col("doc_id") >= i * stride && col("doc_id") < (i + 1) * stride)
        .groupBy(length(col("text")).as("len")).count()
      assert(copyHist.exceptAll(srcHist).count() === 0L, s"copy $i")
    }
  }

  test("affine substitutions: copy 0 identity; any two copies agree on <=2 letters and <=2 digits") {
    // the disjoint-corpora guarantee for 100+ copies: distinct affine
    // maps agree on at most gcd(a1-a2, modulus) = 2 positions per
    // class, so no cross-copy word shingle can survive substitution.
    // The letter family carries this across all 312 copies; the digit
    // family exhausts at MaxDigitCopies = 40, beyond which copies
    // i ≡ j (mod 40) share a digit map — run() refuses k > 40 on a
    // digit-bearing corpus precisely because this bound lapses there.
    val (from0, to0) = ScaleUp.substitution(0)
    assert(from0 == to0, "copy 0 must be the identity substitution")
    val maps = (0 until ScaleUp.MaxCopies).map { i =>
      val (from, to) = ScaleUp.substitution(i)
      assert(from == from0, s"copy $i: from-alphabet must be shared")
      assert(to.toSet.size == to.length, s"copy $i: map must be bijective")
      i -> to
    }
    for ((i, ti) <- maps; (j, tj) <- maps if i < j) {
      val agree = from0.indices.filter(x => ti(x) == tj(x))
      val letters = agree.count(x => from0(x).isLetter && from0(x).isLower)
      val uppers = agree.count(x => from0(x).isLetter && from0(x).isUpper)
      val digits = agree.count(x => from0(x).isDigit)
      assert(letters <= 2 && uppers <= 2,
        s"copies $i,$j agree on $letters lower/$uppers upper letters")
      if (i % ScaleUp.MaxDigitCopies != j % ScaleUp.MaxDigitCopies)
        assert(digits <= 2, s"copies $i,$j agree on $digits digits")
    }
  }

  test("letter maps are pairwise distinct across the full 312-copy family") {
    val letterMaps = (0 until ScaleUp.MaxCopies)
      .map(i => ScaleUp.substitution(i)._2.take(26))
    assert(letterMaps.distinct.size === ScaleUp.MaxCopies)
  }

  test("extended letter family: affine prefix byte-stable, sampled tail " +
      "bijective with checked pairwise agreement <= 4") {
    val k = 400 // past the 312 affine maps into the sampled extension
    val fam = ScaleUp.letterMaps(k)
    assert(fam.size == k)
    // prefix must reproduce the affine family exactly — prior builds
    // at every SF rebuild byte-identically
    for (i <- 0 until ScaleUp.MaxCopies) {
      val affineLetters = ScaleUp.substitution(i)._2.take(26)
      assert(fam(i).map(x => ('a' + x).toChar).mkString == affineLetters,
        s"copy $i diverged from the affine family")
      // and substitutionFor must agree with substitution end-to-end
      assert(ScaleUp.substitutionFor(fam(i), i) == ScaleUp.substitution(i),
        s"substitutionFor($i) != substitution($i)")
    }
    // every member is a bijection; every PAIR (affine x sampled and
    // sampled x sampled included) meets the checked agreement bound
    fam.foreach(m => assert(m.toSet.size == 26))
    for (i <- fam.indices; j <- (i + 1) until fam.size) {
      val agree = (0 until 26).count(x => fam(i)(x) == fam(j)(x))
      assert(agree <= ScaleUp.MaxAgreement,
        s"maps $i,$j agree on $agree letters")
    }
    // determinism: recomputing yields the same family
    val fam2 = ScaleUp.letterMaps(k)
    assert(fam.zip(fam2).forall { case (a, b) => a.sameElements(b) })
  }

  test("rotate: identity at 0, orthogonal and pairwise distinct to dim") {
    import spark.implicits._
    val dim = 8
    val v = (1 to dim).map(_.toDouble)
    val base = Seq(Tuple1(v)).toDF("embedding")
    val images = (0 until dim).map { r =>
      base.select(ScaleUp.rotate(col("embedding"), r))
        .head().getSeq[Double](0).toList
    }
    assert(images(0) === v.toList, "copy 0 must be the identity")
    // all dim rotations of a generic vector are distinct
    assert(images.distinct.size === dim)
    // each preserves the multiset of magnitudes (permutation)
    val mags = v.map(math.abs).sorted
    for ((img, i) <- images.zipWithIndex)
      assert(img.map(math.abs).sorted === mags, s"copy $i")
  }

  test("no copy pair is antipodal: the flip defect stays dead") {
    import spark.implicits._
    // regression for the sf30 build-audit failure: the retired
    // rotate+flip family made copies r and dim+r exact antipodal
    // partners (|cos| = 1 on every source). With rotation-only classes,
    // copy dim+r composes the SAME rotation with the g=1 QR rotation,
    // so the pair's cosine is <u, Q1·u> — bounded by the rotation
    // family's mixing, never structurally ±1.
    val dim = 8
    val v = Seq(0.9, -0.3, 0.1, 0.7, -0.5, 0.2, -0.8, 0.4)
    val base = Seq(Tuple1(v)).toDF("embedding")
    def image(i: Int): Seq[Double] =
      base.select(ScaleUp.embTransform(col("embedding"), i, dim)
        .cast("array<double>")).head().getSeq[Double](0)
    def cos(a: Seq[Double], b: Seq[Double]): Double = {
      def n(x: Seq[Double]) = math.sqrt(x.map(t => t * t).sum)
      a.zip(b).map { case (x, y) => x * y }.sum / (n(a) * n(b))
    }
    for (r <- 0 until dim) {
      val c = cos(image(r), image(dim + r))
      assert(math.abs(c) < 0.95, f"pair ($r, ${dim + r}): |cos|=$c%.3f")
    }
  }

  test("consecutive classes are not shifted-stream twins: " +
       "(g, r) vs (g+1, r+1) stays well off collinear") {
    // regression for the SECOND sf30 build-audit catch: with plain
    // g·γ + c seeding, class g+1's splitmix64 fill was class g's fill
    // shifted ONE draw, so fill_{g+1} ≈ fill_g·P (cyclic column
    // permutation, 63/64 of each row shared) — and Gram–Schmidt
    // commutes with an orthogonal right factor, so Q_{g+1} ≈ Q_g·P and
    // copy (g+1, r+1) was near-collinear with (g, r) on EVERY source
    // (measured |cos| up to 0.996). The finalizer-scrambled seed kills
    // the stream overlap; this pins the exact pair shape that failed.
    import spark.implicits._
    val dim = 16
    val vs = Seq(
      Seq.tabulate(dim)(i => math.sin(i * 1.3) + 0.2 * i),
      Seq.tabulate(dim)(i => if (i % 3 == 0) 1.0 else -0.5))
    for (v <- vs) {
      val base = Seq(Tuple1(v)).toDF("embedding")
      def image(i: Int): Seq[Double] =
        base.select(ScaleUp.embTransform(col("embedding"), i, dim)
          .cast("array<double>")).head().getSeq[Double](0)
      def cos(a: Seq[Double], b: Seq[Double]): Double = {
        def n(x: Seq[Double]) = math.sqrt(x.map(t => t * t).sum)
        a.zip(b).map { case (x, y) => x * y }.sum / (n(a) * n(b))
      }
      for (g <- 1 to 3; r <- Seq(0, 5)) {
        val c = cos(image(g * dim + r), image((g + 1) * dim + r + 1))
        assert(math.abs(c) < 0.9,
          f"(g=$g,r=$r) vs (g=${g + 1},r=${r + 1}): |cos|=$c%.3f")
      }
    }
  }

  test("orthoMatrix is orthonormal, deterministic, and distinct per g") {
    val dim = 16
    for (g <- Seq(1, 2, 7)) {
      val q = ScaleUp.orthoMatrix(g, dim)
      // Q·Qᵀ = I within double round-off
      for (r <- 0 until dim; p <- 0 until dim) {
        val d = (0 until dim).map(c => q(r)(c) * q(p)(c)).sum
        val want = if (r == p) 1.0 else 0.0
        assert(math.abs(d - want) < 1e-9, s"g=$g row $r · row $p = $d")
      }
      // deterministic: a second call reproduces byte-identical rows
      val q2 = ScaleUp.orthoMatrix(g, dim)
      assert(q.flatten.toSeq == q2.flatten.toSeq)
    }
    assert(ScaleUp.orthoMatrix(1, dim).flatten.toSeq !=
      ScaleUp.orthoMatrix(2, dim).flatten.toSeq)
  }

  test("dense-rotation copies defeat the concentrated-vector attack " +
       "the Givens patterns allowed") {
    import spark.implicits._
    // dim 16 so the 0.5 bound is ~2 sd of the 1/√dim concentration —
    // at dim 8 the bound sat 1.5 sd out and a reseeded family tripped
    // it on pure draw luck (0.525, no structure)
    val dim = 16
    // a vector whose mass concentrates on one coordinate — under the
    // old block-structured (Givens-pattern) extension, two copies
    // sharing a base map agreed exactly on every coordinate pair whose
    // pattern bits matched, so this vector could map to cross-copy
    // cosine ≈ 1; a dense seeded-QR rotation mixes globally and the
    // cosine must fall well under the SemDeDup threshold
    val v = 1.0 +: Seq.fill(dim - 1)(0.0)
    val base = Seq(Tuple1(v)).toDF("embedding")
    def image(i: Int): Seq[Double] =
      base.select(ScaleUp.embTransform(col("embedding"), i, dim)
        .cast("array<double>")).head().getSeq[Double](0)
    // copies dim and 2·dim share base rotation 0, differ only by g = 1,2
    val a = image(dim)
    val b = image(2 * dim)
    def norm(x: Seq[Double]) = math.sqrt(x.map(t => t * t).sum)
    // isometry survives the float round-trip
    assert(math.abs(norm(a) - 1.0) < 1e-3)
    assert(math.abs(norm(b) - 1.0) < 1e-3)
    val cos = a.zip(b).map { case (x, y) => x * y }.sum /
      (norm(a) * norm(b))
    assert(math.abs(cos) < 0.5,
      f"cross-copy cosine $cos%.3f — rotation family failed to mix")
    // and against its own base copy
    val b0 = image(0)
    val cos0 = a.zip(b0).map { case (x, y) => x * y }.sum /
      (norm(a) * norm(b0))
    assert(math.abs(cos0) < 0.5, f"vs base copy: $cos0%.3f")
    // distinctness across g for the same base
    assert(a != b)
  }

  test("embedding rotation preserves the norm") {
    val vecs = Tables.load(spark, out, "embeddings")
    val srcNorms = Tables.load(spark, src, "embeddings")
      .select(round(aggregate(col("embedding"), lit(0.0d),
        (acc, x) => acc + x * x), 4).as("n2"))
      .groupBy("n2").count()
    val outNorms = vecs
      .select(round(aggregate(col("embedding"), lit(0.0d),
        (acc, x) => acc + x * x), 4).as("n2"))
      .groupBy("n2").count()
      .withColumn("count", col("count") / 3)
    assert(outNorms.exceptAll(srcNorms).count() === 0L)
  }
}
