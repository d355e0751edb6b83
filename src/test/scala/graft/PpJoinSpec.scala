package graft

import graft.operators.PpJoin
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** PPJoin prefix-filtered exact Jaccard join: exactness against the
  * naive all-elements self-join, the ⌊n/2⌋+1 prefix bound, and the
  * hot-token candidate prune that motivates the operator.
  */
class PpJoinSpec extends SparkSpec {
  import spark.implicits._

  /** (id, tok) distinct-element rows for explicit token sets. */
  private def elems(sets: (Long, Seq[String])*): DataFrame =
    sets.flatMap { case (id, toks) => toks.distinct.map((id, _)) }
      .toDF("id", "tok")

  /** Reference result: the unbounded naive join (every element
    * indexed), exact integer threshold 3·|∩| ≥ |A|+|B|.
    */
  private def naiveEdges(e: DataFrame): Set[(Long, Long)] = {
    val sizes = e.groupBy(col("id")).agg(count(lit(1)).as("n"))
    val a = e.select(col("id").as("id_a"), col("tok"))
    val b = e.select(col("id").as("id_b"), col("tok"))
    a.join(b, Seq("tok")).filter(col("id_a") < col("id_b"))
      .groupBy(col("id_a"), col("id_b")).agg(count(lit(1)).as("c"))
      .join(sizes.select(col("id").as("id_a"), col("n").as("na")), Seq("id_a"))
      .join(sizes.select(col("id").as("id_b"), col("n").as("nb")), Seq("id_b"))
      .filter(col("c") * 3 >= col("na") + col("nb"))
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
  }

  private def ppEdges(e: DataFrame): Set[(Long, Long)] =
    PpJoin.jaccardEdges(e, "id", "tok")
      .as[(Long, Long)].collect().toSet

  // a corpus with one boilerplate token in EVERY doc (the hot key that
  // makes the naive join quadratic), a near-dup pair, an exact dup
  // pair, and unrelated docs
  private def corpus = elems(
    1L -> Seq("hot", "aa", "bb", "cc", "dd"),
    2L -> Seq("hot", "aa", "bb", "cc", "ee"), // J(1,2)=4/6 ≥ ½
    3L -> Seq("hot", "zz", "yy", "xx", "ww"),
    4L -> Seq("hot", "zz", "yy", "xx", "ww"), // J(3,4)=1
    5L -> Seq("hot", "pp", "qq"),
    6L -> Seq("hot", "rr", "ss", "tt", "uu", "vv", "oo", "nn"),
    7L -> Seq("hot"))

  test("edges equal the naive unbounded join exactly") {
    assert(ppEdges(corpus) == naiveEdges(corpus))
    assert(ppEdges(corpus) == Set((1L, 2L), (3L, 4L)))
  }

  test("exactness holds on randomized set families") {
    val rnd = new scala.util.Random(42)
    val vocab = (0 until 30).map(i => s"t$i")
    val sets = (0L until 40L).map { id =>
      id -> rnd.shuffle(vocab).take(2 + rnd.nextInt(10)).toSeq
    }
    val e = elems(sets: _*)
    assert(ppEdges(e) == naiveEdges(e))
  }

  test("audited hash-space execution equals the string-space path") {
    // jaccardEdges re-keys string tokens to xxhash64 after proving the
    // hash injective on the vocabulary; edgesOver on the raw frame is
    // the string-space path the audit falls back to — same edges,
    // by the Jaccard-under-injection argument the audit licenses
    val rnd = new scala.util.Random(7)
    val vocab = (0 until 40).map(i => s"tok$i")
    val sets = (0L until 50L).map { id =>
      id -> rnd.shuffle(vocab).take(2 + rnd.nextInt(12)).toSeq
    }
    val e = elems(sets: _*)
    val viaStrings = PpJoin.edgesOver(e, "id", "tok", 1, 2)
      .as[(Long, Long)].collect().toSet
    assert(ppEdges(e) == viaStrings)
    assert(viaStrings == naiveEdges(e))
  }

  test("null tokens are excluded, and never become joinable via the rekey") {
    // string-space equi-joins drop null tokens (null ≠ null at the
    // dfreq join, collect_list skips them at verify) — so a null is
    // not a set member. The hash rekey must preserve that: without the
    // entry-point null filter, xxhash64(null) is the non-null SEED, so
    // docs sharing only a null token would acquire one shared joinable
    // value, and the injectivity audit (which counts the null row on
    // both sides) could not detect the divergence.
    val e = elems(
      1L -> Seq(null, "a", "b"),
      2L -> Seq(null, "a", "b"), // J over non-null sets = 1
      3L -> Seq(null, "x"), // shares ONLY the null with 1 and 2
      4L -> Seq(null)) // all-null set: no non-null members at all
    val got = ppEdges(e)
    assert(got == Set((1L, 2L)))
    // string-space path on the same frame agrees (nulls drop there by
    // join semantics rather than by the explicit filter)
    val viaStrings = PpJoin
      .edgesOver(e.filter(col("tok").isNotNull), "id", "tok", 1, 2)
      .as[(Long, Long)].collect().toSet
    assert(got == viaStrings)
  }

  test("prefix index holds at most ⌊n/2⌋+1 tokens per set") {
    val prefix = PpJoin.prefixIndex(corpus, "id", "tok", 1, 2)
    val perSet = prefix.groupBy(col("id"))
      .agg(count(lit(1)).as("p"), first(col("n")).as("n"))
      .as[(Long, Long, Long)].collect()
    assert(perSet.nonEmpty)
    perSet.foreach { case (id, p, n) =>
      assert(p == n / 2 + 1, s"set $id: prefix $p of $n")
    }
  }

  test("hot token never enters a prefix (candidates stay linear)") {
    // "hot" has the max DF, so the ascending-DF order puts it LAST in
    // every set — outside each ⌊n/2⌋+1 prefix (all sets here have ≥ 2
    // tokens except doc 7, whose 1-token set is all-prefix).
    val prefix = PpJoin.prefixIndex(corpus, "id", "tok", 1, 2)
    val hotIds = prefix.filter(col("tok") === "hot")
      .select("id").as[Long].collect().toSet
    assert(hotIds == Set(7L), s"hot indexed for $hotIds")
    // the naive join fans the 7 hot-sharers into C(7,2)=21 candidate
    // pairs; the prefix index generates only the pairs that can pass
    val cand = PpJoin.candidatePairs(prefix, "id", "tok", 1, 2)
    assert(cand.count() < 21)
  }

  test("general thresholds: J ≥ 2/3 and J ≥ 1/4 match the naive join") {
    // the parameterized integer math: prefix n − ⌈p·n/q⌉ + 1, size
    // filter q·min ≥ p·max, verify c·(p+q) ≥ p·(na+nb)
    def naiveAt(e: DataFrame, p: Int, q: Int): Set[(Long, Long)] = {
      val sizes = e.groupBy(col("id")).agg(count(lit(1)).as("n"))
      e.select(col("id").as("id_a"), col("tok"))
        .join(e.select(col("id").as("id_b"), col("tok")), Seq("tok"))
        .filter(col("id_a") < col("id_b"))
        .groupBy(col("id_a"), col("id_b")).agg(count(lit(1)).as("c"))
        .join(sizes.select(col("id").as("id_a"), col("n").as("na")),
          Seq("id_a"))
        .join(sizes.select(col("id").as("id_b"), col("n").as("nb")),
          Seq("id_b"))
        .filter(col("c") * (p + q) >= (col("na") + col("nb")) * p)
        .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    }
    val rnd = new scala.util.Random(7)
    val vocab = (0 until 25).map(i => s"t$i")
    val sets = (0L until 30L).map { id =>
      id -> rnd.shuffle(vocab).take(2 + rnd.nextInt(8)).toSeq
    }
    val e = elems(sets: _*)
    for ((p, q) <- Seq((2, 3), (1, 4))) {
      val pp = PpJoin.jaccardEdges(e, "id", "tok", p, q)
        .as[(Long, Long)].collect().toSet
      assert(pp == naiveAt(e, p, q), s"threshold $p/$q diverged")
    }
  }

  test("bipartite edges equal the naive cross-frame join exactly") {
    // reference: every element of both frames indexed, no prefix bound
    def naiveBi(l: DataFrame, r: DataFrame): Set[(Long, Long)] = {
      val sa = l.groupBy(col("id")).agg(count(lit(1)).as("na"))
      val sb = r.groupBy(col("id")).agg(count(lit(1)).as("nb"))
      l.select(col("id").as("id_a"), col("tok"))
        .join(r.select(col("id").as("id_b"), col("tok")), Seq("tok"))
        .groupBy(col("id_a"), col("id_b")).agg(count(lit(1)).as("c"))
        .join(sa.select(col("id").as("id_a"), col("na")), Seq("id_a"))
        .join(sb.select(col("id").as("id_b"), col("nb")), Seq("id_b"))
        .filter(col("c") * 3 >= col("na") + col("nb"))
        .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    }
    def biEdges(l: DataFrame, r: DataFrame): Set[(Long, Long)] =
      PpJoin.jaccardEdgesBipartite(l, r, "id", "tok")
        .as[(Long, Long)].collect().toSet

    // hostile split of the hot-token corpus: overlapping ids across the
    // sides (ids are per-side set keys, never assumed globally unique)
    val left = elems(
      1L -> Seq("hot", "aa", "bb", "cc", "dd"),
      3L -> Seq("hot", "zz", "yy", "xx", "ww"),
      5L -> Seq("hot", "pp", "qq"),
      7L -> Seq("hot"))
    val right = elems(
      2L -> Seq("hot", "aa", "bb", "cc", "ee"), // J(l1,r2)=4/6 ≥ ½
      3L -> Seq("hot", "zz", "yy", "xx", "ww"), // J(l3,r3)=1
      5L -> Seq("hot", "rr", "ss"),             // J(l5,r5)=1/5 < ½
      6L -> Seq("hot"))                          // J(l7,r6)=1
    assert(biEdges(left, right) == naiveBi(left, right))
    assert(biEdges(left, right) == Set((1L, 2L), (3L, 3L), (7L, 6L)))

    // randomized families on both sides
    val rnd = new scala.util.Random(11)
    val vocab = (0 until 25).map(i => s"t$i")
    def rndSets(n: Long) = (0L until n).map { id =>
      id -> rnd.shuffle(vocab).take(2 + rnd.nextInt(9)).toSeq
    }
    val rl = elems(rndSets(25): _*)
    val rr = elems(rndSets(25): _*)
    assert(biEdges(rl, rr) == naiveBi(rl, rr))
    // and at a non-default threshold the parameterized math still holds
    val pp23 = PpJoin.jaccardEdgesBipartite(rl, rr, "id", "tok", 2, 3)
      .as[(Long, Long)].collect().toSet
    val na23 = {
      val sa = rl.groupBy(col("id")).agg(count(lit(1)).as("na"))
      val sb = rr.groupBy(col("id")).agg(count(lit(1)).as("nb"))
      rl.select(col("id").as("id_a"), col("tok"))
        .join(rr.select(col("id").as("id_b"), col("tok")), Seq("tok"))
        .groupBy(col("id_a"), col("id_b")).agg(count(lit(1)).as("c"))
        .join(sa.select(col("id").as("id_a"), col("na")), Seq("id_a"))
        .join(sb.select(col("id").as("id_b"), col("nb")), Seq("id_b"))
        .filter(col("c") * 5 >= (col("na") + col("nb")) * 2)
        .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    }
    assert(pp23 == na23, "threshold 2/3 bipartite diverged")
  }

  test("tagged bipartite face ≡ two-frame face: one side-flagged frame " +
      "yields identical pairs (r20 — the d36 shape), null sides drop " +
      "exactly like the boolean filters they replace") {
    def taggedOf(l: DataFrame, r: DataFrame): DataFrame =
      l.withColumn("is_r", lit(false))
        .unionByName(r.withColumn("is_r", lit(true)))
    def pairsTagged(t: DataFrame, p: Int = 1, q: Int = 2) =
      PpJoin.jaccardEdgesBipartiteTagged(t, "id", "tok", "is_r", p, q)
        .as[(Long, Long)].collect().toSet
    def pairsTwoFrame(l: DataFrame, r: DataFrame, p: Int = 1, q: Int = 2) =
      PpJoin.jaccardEdgesBipartite(l, r, "id", "tok", p, q)
        .as[(Long, Long)].collect().toSet

    // the hot-token corpus with overlapping ids across sides
    val left = elems(
      1L -> Seq("hot", "aa", "bb", "cc", "dd"),
      3L -> Seq("hot", "zz", "yy", "xx", "ww"),
      5L -> Seq("hot", "pp", "qq"),
      7L -> Seq("hot"))
    val right = elems(
      2L -> Seq("hot", "aa", "bb", "cc", "ee"),
      3L -> Seq("hot", "zz", "yy", "xx", "ww"),
      5L -> Seq("hot", "rr", "ss"),
      6L -> Seq("hot"))
    assert(pairsTagged(taggedOf(left, right)) ==
      pairsTwoFrame(left, right))

    // randomized families, default AND non-default threshold
    val rnd = new scala.util.Random(13)
    val vocab = (0 until 25).map(i => s"t$i")
    def rndSets(n: Long) = (0L until n).map { id =>
      id -> rnd.shuffle(vocab).take(2 + rnd.nextInt(9)).toSeq
    }
    val rl = elems(rndSets(25): _*)
    val rr = elems(rndSets(25): _*)
    assert(pairsTagged(taggedOf(rl, rr)) == pairsTwoFrame(rl, rr))
    assert(pairsTagged(taggedOf(rl, rr), 2, 3) ==
      pairsTwoFrame(rl, rr, 2, 3), "threshold 2/3 tagged diverged")

    // a NULL side row contributes to NEITHER side — the two-frame
    // face's `filter(side)` / `filter(!side)` pair drops it the same
    // way (d36: a null content-hash bucket doc leaves the comparison)
    val withNull = taggedOf(left, right).unionByName(
      elems(1L -> Seq("hot", "aa", "bb", "cc", "dd"))
        .withColumn("is_r", lit(null).cast("boolean")))
    assert(pairsTagged(withNull) == pairsTwoFrame(left, right),
      "null-side rows must not join either side")
  }

  test("positional band: exact on threshold-straddling perturbed families") {
    // families built by perturbing base sets K elements at a time, so
    // pair Jaccards cluster AROUND the threshold — the regime where the
    // positional filter's accept/verify/reject bands all fire; large
    // sets (20-40 tokens) give long prefixes where position matters
    val rnd = new scala.util.Random(23)
    val vocab = (0 until 400).map(i => f"v$i%03d")
    val sets = (0 until 8).flatMap { fam =>
      val base = rnd.shuffle(vocab).take(20 + rnd.nextInt(21))
      (0 until 5).map { v =>
        val drop = rnd.nextInt(1 + base.length / 2)
        val keep = base.drop(drop)
        val add = rnd.shuffle(vocab.filterNot(base.contains))
          .take(drop)
        (fam * 5L + v) -> (keep ++ add)
      }
    }
    val e = elems(sets: _*)
    assert(ppEdges(e) == naiveEdges(e))

    // the positional upper bound must PRUNE on this family: compare the
    // surviving candidates against the pre-positional count (distinct
    // prefix-sharing size-compatible pairs)
    val prefix = PpJoin.prefixIndex(e, "id", "tok", 1, 2)
    val prePositional = prefix.select(col("tok"), col("id").as("id_a"),
        col("n").as("na"))
      .join(prefix.select(col("tok"), col("id").as("id_b"),
        col("n").as("nb")), Seq("tok"))
      .filter(col("id_a") < col("id_b"))
      .filter(least(col("na"), col("nb")) * 2 >=
        greatest(col("na"), col("nb")))
      .select("id_a", "id_b").distinct().count()
    val cand = PpJoin.candidatePairs(prefix, "id", "tok", 1, 2)
    assert(cand.count() < prePositional,
      s"positional filter pruned nothing (${cand.count()} of $prePositional)")
    // auto-accepted pairs (o alone proves the threshold) must be true
    // edges; at t=1/2 that band only reaches sets of ≤6 tokens (the
    // ⌊n/2⌋+1 prefix can't certify ⌈2n/3⌉ overlap beyond that), so
    // assert it on explicit small near-dups
    val small = elems(
      100L -> Seq("s1", "s2", "s3"),
      101L -> Seq("s1", "s2", "s3"))
    val smallCand = PpJoin.candidatePairs(
      PpJoin.prefixIndex(small, "id", "tok", 1, 2), "id", "tok", 1, 2)
    val sure = smallCand.filter(col("o") * 3 >= (col("na") + col("nb")))
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(sure == Set((100L, 101L)),
      "small near-dup should be provable from prefix overlap alone")
  }

  test("edge case: empty input and singleton sets") {
    val empty = Seq.empty[(Long, String)].toDF("id", "tok")
    assert(PpJoin.jaccardEdges(empty, "id", "tok").count() == 0)
    val singles = elems(1L -> Seq("x"), 2L -> Seq("x"), 3L -> Seq("y"))
    assert(ppEdges(singles) == Set((1L, 2L)))
  }
}
