package graft

import graft.operators.EdJoin
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Ed-Join q-gram-prefix-filtered exact edit-distance join: exactness
  * against the naive quadratic join on adversarial (shared-prefix) and
  * randomized corpora, the sub-q exclusion contract, and true-distance
  * output values.
  */
class EdJoinSpec extends SparkSpec {
  import spark.implicits._

  private def strs(rows: (Long, String)*): DataFrame =
    rows.toDF("id", "s")

  /** Reference result: the naive all-pairs join under the same length
    * floor (the documented sub-q exclusion), full 2-arg levenshtein.
    */
  private def naivePairs(df: DataFrame, k: Int, q: Int)
      : Set[(Long, Long, Int)] = {
    val s = df.filter(length(col("s")) >= q)
    val a = s.select(col("id").as("id_a"), col("s").as("sa"))
    val b = s.select(col("id").as("id_b"), col("s").as("sb"))
    a.crossJoin(b).filter(col("id_a") < col("id_b"))
      .withColumn("dist", levenshtein(col("sa"), col("sb")))
      .filter(col("dist") <= k)
      .select(col("id_a"), col("id_b"), col("dist"))
      .as[(Long, Long, Int)].collect().toSet
  }

  private def edPairs(df: DataFrame, k: Int, q: Int = 3)
      : Set[(Long, Long, Int)] =
    EdJoin.editPairs(df, "id", "s", k, q)
      .as[(Long, Long, Int)].collect().toSet

  // the hot-block failure mode the operator exists for: every string
  // shares the "Customer#0000" prefix (so positional segment blocking
  // collapses to one block), with near-dups differing in the tail
  private def prefixCorpus = strs(
    1L -> "Customer#000000001",
    2L -> "Customer#000000002", // ed(1,2)=1
    3L -> "Customer#000000013", // ed(1,3)=2, ed(2,3)=2
    4L -> "Customer#000999999",
    5L -> "Customer#000999998", // ed(4,5)=1
    6L -> "Supplier#000000001", // ed(1,6)=8 — out at any small k
    7L -> "Customer#00000001",  // deletion vs 1: ed=1
    8L -> "Xustomer#000000001") // substitution vs 1: ed=1

  test("pairs equal the naive quadratic join on the shared-prefix corpus") {
    for (k <- 1 to 3)
      assert(edPairs(prefixCorpus, k) == naivePairs(prefixCorpus, k, 3),
        s"k=$k")
  }

  test("dist column carries the true edit distance") {
    val got = edPairs(prefixCorpus, 2)
    assert(got.contains((1L, 2L, 1)))
    assert(got.contains((1L, 3L, 2)))
    assert(got.contains((1L, 7L, 1)))
    assert(got.contains((1L, 8L, 1)))
  }

  test("exactness holds on randomized corpora across k and q") {
    val rnd = new scala.util.Random(7)
    val alpha = "abcd" // tiny alphabet → dense collisions
    def word(n: Int) = Seq.fill(n)(alpha(rnd.nextInt(alpha.length))).mkString
    val base = (0L until 25L).map(i => i -> word(6 + rnd.nextInt(6)))
    // perturbed copies: single edits of existing strings, so many pairs
    // straddle every threshold
    val perturbed = (0 until 25).map { i =>
      val (_, s) = base(rnd.nextInt(base.length))
      val p = rnd.nextInt(s.length)
      val mutated = rnd.nextInt(3) match {
        case 0 => s.updated(p, alpha(rnd.nextInt(alpha.length)))
        case 1 => s.take(p) + s.drop(p + 1)
        case _ => s.take(p) + alpha(rnd.nextInt(alpha.length)) + s.drop(p)
      }
      (100L + i) -> mutated
    }
    val df = strs((base ++ perturbed): _*)
    for (k <- 1 to 2; q <- 2 to 3)
      assert(edPairs(df, k, q) == naivePairs(df, k, q), s"k=$k q=$q")
  }

  test("strings shorter than q are excluded (documented floor)") {
    val df = strs(1L -> "ab", 2L -> "ab", 3L -> "abcd", 4L -> "abcd")
    assert(edPairs(df, 1, 3) == Set((3L, 4L, 0)))
  }

  test("short strings pair even with zero shared grams") {
    // ed("abcdef","aXcdYf") = 2 yet the two gram SETS are disjoint
    // ({abc,bcd,cde,def} vs {aXc,Xcd,cdY,dYf}) — the k·q bound is
    // vacuous when both sides hold ≤ k·q distinct grams, so the gram
    // join alone can never emit this pair; the length-banded short
    // path must.
    val df = strs(1L -> "abcdef", 2L -> "aXcdYf", 3L -> "zzzzzz",
      4L -> "abcdefabcdefabcdef")
    val got = edPairs(df, 2)
    assert(got.contains((1L, 2L, 2)))
    assert(got == naivePairs(df, 2, 3))
  }

  test("exactness holds on randomized SHORT corpora (the vacuous-bound class)") {
    val rnd = new scala.util.Random(13)
    val alpha = "abcdefgh"
    def word(n: Int) = Seq.fill(n)(alpha(rnd.nextInt(alpha.length))).mkString
    // lengths 3..8 with double edits: most strings hold ≤ k·q distinct
    // grams, so every pair the gram path misses must come from the
    // short path
    val base = (0L until 20L).map(i => i -> word(3 + rnd.nextInt(6)))
    val perturbed = (0 until 30).map { i =>
      val (_, s0) = base(rnd.nextInt(base.length))
      var m = s0
      (0 until 1 + rnd.nextInt(2)).foreach { _ =>
        val p = rnd.nextInt(m.length)
        m = rnd.nextInt(3) match {
          case 0 => m.updated(p, alpha(rnd.nextInt(alpha.length)))
          case 1 => if (m.length > 3) m.take(p) + m.drop(p + 1) else m
          case _ => m.take(p) + alpha(rnd.nextInt(alpha.length)) + m.drop(p)
        }
      }
      (100L + i) -> m
    }
    val df = strs((base ++ perturbed): _*)
    for (k <- 1 to 2; q <- 2 to 3)
      assert(edPairs(df, k, q) == naivePairs(df, k, q), s"k=$k q=$q")
  }

  test("exactness holds at the d40 configuration (large k, wide grams)") {
    // k=6/q=6 is the capped-NN production config — prefix k·q+1 = 37,
    // short class = strings with ≤ 36 distinct 6-grams (length ≤ 41),
    // so mid-length strings exercise BOTH candidate paths at once
    val rnd = new scala.util.Random(47)
    val alpha = "abcdef"
    def word(n: Int) = Seq.fill(n)(alpha(rnd.nextInt(alpha.length))).mkString
    val base = (0L until 15L).map(i => i -> word(20 + rnd.nextInt(25)))
    val perturbed = (0 until 25).map { i =>
      val (_, s0) = base(rnd.nextInt(base.length))
      var m = s0
      (0 until 1 + rnd.nextInt(6)).foreach { _ =>
        val p = rnd.nextInt(m.length)
        m = rnd.nextInt(3) match {
          case 0 => m.updated(p, alpha(rnd.nextInt(alpha.length)))
          case 1 => if (m.length > 8) m.take(p) + m.drop(p + 1) else m
          case _ => m.take(p) + alpha(rnd.nextInt(alpha.length)) + m.drop(p)
        }
      }
      (100L + i) -> m
    }
    val df = strs((base ++ perturbed): _*)
    for ((k, q) <- Seq((4, 5), (6, 6)))
      assert(edPairs(df, k, q) == naivePairs(df, k, q), s"k=$k q=$q")
  }

  test("deletion-neighborhood path equals the naive join and the gram path") {
    // the shared-prefix corpus is the deletion path's home turf: gram
    // postings densify with the corpus while ≤k-deletion variants stay
    // near-unique
    for (k <- 1 to 2) {
      val byDel = EdJoin.editPairsByDeletion(prefixCorpus, "id", "s", k)
        .as[(Long, Long, Int)].collect().toSet
      assert(byDel == naivePairs(prefixCorpus, k, 1), s"k=$k naive")
      assert(byDel == edPairs(prefixCorpus, k, 3).filter(_._3 <= k),
        s"k=$k gram path") // same floor-free corpus (all len 18 ≥ q)
    }
  }

  test("deletion-neighborhood path: indels, duplicates, randomized corpora") {
    // insertions/deletions change length — the variant key must still
    // collide (delete the inserted char on one side only)
    val mixed = strs(1L -> "abcdef", 2L -> "abcdefg", 3L -> "abdef",
      4L -> "abcdef", 5L -> "zzzzzz")
    val got = EdJoin.editPairsByDeletion(mixed, "id", "s", 1)
      .as[(Long, Long, Int)].collect().toSet
    assert(got == naivePairs(mixed, 1, 1))
    assert(got.contains((1L, 2L, 1)) && got.contains((1L, 3L, 1))
      && got.contains((1L, 4L, 0)))
    val rnd = new scala.util.Random(29)
    val alpha = "abcde"
    def word(n: Int) = Seq.fill(n)(alpha(rnd.nextInt(alpha.length))).mkString
    val base = (0L until 20L).map(i => i -> word(4 + rnd.nextInt(8)))
    val perturbed = (0 until 30).map { i =>
      val (_, s0) = base(rnd.nextInt(base.length))
      var m = s0
      (0 until 1 + rnd.nextInt(2)).foreach { _ =>
        val p = rnd.nextInt(m.length)
        m = rnd.nextInt(3) match {
          case 0 => m.updated(p, alpha(rnd.nextInt(alpha.length)))
          case 1 => if (m.length > 2) m.take(p) + m.drop(p + 1) else m
          case _ => m.take(p) + alpha(rnd.nextInt(alpha.length)) + m.drop(p)
        }
      }
      (100L + i) -> m
    }
    val df = strs((base ++ perturbed): _*)
    for (k <- 1 to 2)
      assert(EdJoin.editPairsByDeletion(df, "id", "s", k)
        .as[(Long, Long, Int)].collect().toSet == naivePairs(df, k, 1),
        s"k=$k")
  }

  test("measured-bound strategy branches produce identical pairs") {
    // broadcastCap = 0 forces every measured decision to the
    // sort-merge branch; the default cap takes the broadcast branch on
    // these tiny corpora — both must be pure physical-strategy choices
    // with byte-identical results, on both the gram and deletion paths
    val dfD = prefixCorpus
    for (k <- 1 to 2) {
      val bc = EdJoin.editPairsByDeletion(dfD, "id", "s", k)
        .as[(Long, Long, Int)].collect().toSet
      val smj = EdJoin.editPairsByDeletion(dfD, "id", "s", k,
          broadcastCap = 0L)
        .as[(Long, Long, Int)].collect().toSet
      assert(bc == smj, s"deletion path k=$k")
    }
    for (k <- 1 to 2) {
      val bc = EdJoin.editPairs(dfD, "id", "s", k, 3)
        .as[(Long, Long, Int)].collect().toSet
      val smj = EdJoin.editPairs(dfD, "id", "s", k, 3,
          broadcastCap = 0L)
        .as[(Long, Long, Int)].collect().toSet
      assert(bc == smj, s"gram path k=$k")
    }
  }

  test("periodic long strings stay exact outside the short path") {
    // "ababab…" of ANY length holds ≤ 4 distinct 3-grams, so a
    // gram-count-only short-class test would drag arbitrarily long
    // periodic strings (boilerplate heads, '----' rules) into the
    // exhaustive band path and make its blocks O(corpus). Membership is
    // length-bounded instead; these pairs must come out of the gram
    // path, and exactness must survive that routing.
    val rows = Seq[(Long, String)](
      1L -> ("ab" * 20),              // len 40, 2 distinct 3-grams
      2L -> ("ab" * 20 + "x"),        // ed(1,2)=1
      3L -> ("ab" * 19),              // ed(1,3)=2
      4L -> ("-" * 30),               // 1 distinct gram
      5L -> ("-" * 29 + "x"),         // ed(4,5)=1
      6L -> ("cd" * 20),              // far from everything
      7L -> ("ab" * 7),               // len 14: short class at k=2,q=3? len>11 → no
      8L -> ("abab"))                 // genuinely short periodic
    val df = strs(rows: _*)
    for (k <- 1 to 2; q <- 2 to 3)
      assert(edPairs(df, k, q) == naivePairs(df, k, q), s"k=$k q=$q")
  }

  test("short-path membership is length-bounded, not gram-count-bounded") {
    // structural check for the scale claim: a 40-char periodic string
    // (2 distinct grams, m ≤ k·q) must contribute ZERO rows to the
    // band side — its pairs are the gram path's job
    val periodic = strs(1L -> ("ab" * 20), 2L -> ("ab" * 20 + "x"),
      3L -> "abcdef")
    // reconstruct the operator's short-class predicate at k=2, q=3:
    // m ≤ 6 AND len ≤ 8 — only id 3 qualifies
    val k = 2; val q = 3
    val s = periodic.select(col("id").as("_id"), col("s").as("_str"))
      .filter(length(col("_str")) >= q)
    val grams = s.select(col("_id"), explode(array_distinct(
      expr(s"transform(sequence(1, length(_str) - ${q - 1})," +
        s" i -> substring(_str, i, $q))"))).as("gram"))
    val m = grams.groupBy(col("_id")).agg(count(lit(1)).as("_m"))
    val shortIds = s.join(m, Seq("_id")).filter(col("_m") <= k * q)
      .filter(length(col("_str")) <= k * q + q - 1)
      .select("_id").as[Long].collect().toSet
    assert(shortIds == Set(3L),
      "periodic long strings must not enter the band path")
    // and the pair the gram path owes: still found, exactly
    assert(edPairs(periodic, k, q) == naivePairs(periodic, k, q))
  }

  test("blockCols: pairs form only inside blocks, equal to the filtered naive join") {
    // identical and near-identical strings placed in DIFFERENT blocks:
    // a post-hoc filter would generate then discard those pairs; the
    // blocked join must never form them, and within-block results must
    // equal the naive join restricted to block agreement
    val rows = Seq(
      (1L, "Customer#000000001", "en", "web"),
      (2L, "Customer#000000002", "en", "web"),  // in-block near-dup of 1
      (3L, "Customer#000000001", "fr", "web"),  // exact dup, wrong lang
      (4L, "Customer#000000001", "en", "pdf"),  // exact dup, wrong source
      (5L, "Customer#000000003", "en", "web"),
      (6L, "abcdef", "en", "web"),              // short class, in block
      (7L, "aXcdYf", "en", "web"),              // ed=2, zero shared grams
      (8L, "abcdef", "fr", "web"))              // short class, wrong block
    val df = rows.toDF("id", "s", "lang", "source")
    for (k <- 1 to 2; q <- 2 to 3) {
      val got = EdJoin.editPairs(df, "id", "s", k, q,
          blockCols = Seq("lang", "source"))
        .as[(Long, Long, Int)].collect().toSet
      val sameBlock = rows.map(r => r._1 -> (r._3, r._4)).toMap
      val want = naivePairs(df, k, q)
        .filter(p => sameBlock(p._1) == sameBlock(p._2))
      assert(got == want, s"k=$k q=$q")
      assert(!got.exists(p => Set(p._1, p._2).subsetOf(Set(1L, 3L, 4L))),
        "cross-block exact dups must not pair")
    }
    // zero-shared-gram short pair still found inside its block at k=2
    val k2 = EdJoin.editPairs(df, "id", "s", 2, 3,
        blockCols = Seq("lang", "source"))
      .as[(Long, Long, Int)].collect().toSet
    assert(k2.contains((6L, 7L, 2)))
    assert(!k2.exists(p => p._1 == 6L && p._2 == 8L))
  }

  test("editProbeStream refuses an index built at a different k") {
    val corpus = strs(1L -> "abcdef", 2L -> "abcdeg")
    val idx1 = EdJoin.deletionKeys(corpus, "id", "s", k = 1)
    // mismatched k: the index intersects a k=2 probe on a variant
    // subset — silent missed pairs — so the call must fail fast
    val e = intercept[IllegalArgumentException] {
      EdJoin.editProbeStream(corpus, "id", "s", idx1, k = 2, "unused") {
        (_, _) => ()
      }
    }
    assert(e.getMessage.contains("k=1") && e.getMessage.contains("k=2"))
    // an index with no stamp (not built via deletionKeys) is refused too
    val unstamped = idx1.select(col("_id"), col("_str"),
      (col("_key") + 0).as("_key")) // arithmetic strips metadata
    intercept[IllegalArgumentException] {
      EdJoin.editProbeStream(corpus, "id", "s", unstamped, k = 1,
        "unused") { (_, _) => () }
    }
  }

  test("duplicate strings and empty result sets are handled") {
    val dup = strs(1L -> "aaaa", 2L -> "aaaa", 3L -> "aaaa")
    assert(edPairs(dup, 1) ==
      Set((1L, 2L, 0), (1L, 3L, 0), (2L, 3L, 0)))
    val far = strs(1L -> "aaaa", 2L -> "zzzz")
    assert(edPairs(far, 2) == Set.empty)
  }
}
