package graft

import graft.functions.Winnow
import graft.operators.SubstrDedup
import org.apache.spark.unsafe.types.UTF8String

import scala.util.Random

/** Kernel + operator tests for the repeated-substring family.
  *
  * The oracle gate (d44/d45 vs DuckDB's all-positions enumeration)
  * checks the END result on the real corpus; these tests pin the two
  * claims the gate can't isolate: the winnowing GUARANTEE (every shared
  * run ≥ k+w−1 yields a common selected fingerprint — the exactness of
  * the sampled index) and the verification step's soundness (no pair
  * without a real ≥ minLen run survives, even under planted 32-bit
  * hash-collision-like near-misses).
  */
class SubstrDedupSpec extends SparkSpec {

  // kernel output is FLAT (pos, hash64) pairs — regroup for assertions
  private def fps(s: String, k: Int, w: Int): Seq[(Int, Long)] =
    Winnow.select(UTF8String.fromString(s), k, w)
      .grouped(2).map(p => (p(0).toInt, p(1))).toSeq

  private def positions(a: Seq[(Int, Long)]): Seq[Int] = a.map(_._1)

  test("kernel: empty below k, single fingerprint at exactly k") {
    assert(fps("abc", 4, 3).isEmpty)
    val one = fps("abcd", 4, 3)
    assert(one.length == 1 && positions(one) == Seq(1))
  }

  test("kernel: positions are 1-based, in range, strictly increasing") {
    val r = new Random(7)
    for (_ <- 1 to 50) {
      val s = Random.alphanumeric.take(5 + r.nextInt(200)).mkString
      val out = positions(fps(s, 8, 5))
      assert(out == out.sorted && out.distinct == out)
      out.foreach(p => assert(p >= 1 && p <= s.length - 8 + 1))
    }
  }

  test("kernel: every w-window of gram positions contains a selection") {
    // the local coverage property the guarantee is built from
    val r = new Random(11)
    for (_ <- 1 to 30) {
      val s = (1 to 120 + r.nextInt(200))
        .map(_ => ('a' + r.nextInt(4)).toChar).mkString // repetitive
      val k = 5; val w = 7
      val sel = positions(fps(s, k, w)).map(_ - 1).toSet
      val n = s.length - k + 1
      for (start <- 0 to n - w)
        assert((start until start + w).exists(sel),
          s"window at $start uncovered in '$s'")
    }
  }

  test("kernel: selection inside a shared run agrees across contexts") {
    // the guarantee itself: plant one shared run of length k+w-1 into
    // two random hosts at different offsets; both docs must select a
    // common (hash, aligned-position) fingerprint inside the run
    val r = new Random(23)
    val k = 6; val w = 9; val run = k + w - 1
    for (trial <- 1 to 60) {
      val shared = (1 to run).map(_ => ('a' + r.nextInt(26)).toChar).mkString
      def host(pre: Int, post: Int) =
        (Random.alphanumeric.take(pre).mkString.toUpperCase,
          Random.alphanumeric.take(post).mkString.toUpperCase)
      val (p1, s1) = host(r.nextInt(40), r.nextInt(40))
      val (p2, s2) = host(r.nextInt(40), r.nextInt(40))
      val a = p1 + shared + s1
      val b = p2 + shared + s2
      val fa = fps(a, k, w).map { case (p, h) => (p - p1.length, h) }.toSet
      val fb = fps(b, k, w).map { case (p, h) => (p - p2.length, h) }.toSet
      // common fingerprint at the SAME offset relative to the run, with
      // that offset inside [1, w] (gram start within the run's window)
      val common = fa.intersect(fb)
        .filter { case (off, _) => off >= 1 && off <= w }
      assert(common.nonEmpty, s"trial $trial: no shared fingerprint")
    }
  }

  test("repeatedGramDocs matches brute force on a random mini-corpus") {
    val r = new Random(31)
    val boiler = "-- COPYRIGHT NOTICE ALL RIGHTS RESERVED 2026 --" // 47
    val docs = (1L to 30L).map { id =>
      val body = (1 to 60 + r.nextInt(120))
        .map(_ => ('a' + r.nextInt(6)).toChar).mkString
      val txt = if (id % 3 == 0) body.take(20) + boiler + body.drop(20)
                else body
      (id, txt)
    }
    val L = 40
    val df = spark.createDataFrame(docs).toDF("doc_id", "text")
    val got = SubstrDedup.repeatedGramDocs(df, "doc_id", "text", L)
      .collect().map(row => (row.getString(0), row.getLong(1))).toMap
    val brute = docs.flatMap { case (id, txt) =>
      (0 to txt.length - L).map(p => (txt.substring(p, p + L), id))
    }.groupBy(_._1).view.mapValues(_.map(_._2).distinct.size.toLong)
      .filter(_._2 >= 2).toMap
    assert(got == brute)
  }

  test("longRepeatPairs == brute-force pairs, incl. aaaa-periodic docs") {
    val r = new Random(43)
    val minLen = 30; val w = 8 // k = 23
    val runA = (1 to minLen).map(_ => ('a' + r.nextInt(26)).toChar).mkString
    val docs = Seq.newBuilder[(Long, String)]
    var id = 0L
    def add(t: String): Unit = { id += 1; docs += ((id, t)) }
    // pair via planted run at different offsets
    add("XX" + runA + "YYYYYYYYYY")
    add("ZZZZZZZ" + runA)
    // near-miss: shares only minLen-1 of the run (must NOT pair w/ 1-2)
    add("QQ" + runA.drop(1) + "WWWW")
    // periodic pair (equal hashes everywhere; rightmost-tie path)
    add("b" * 80)
    add("ccc" + "b" * 64)
    // short doc: below minLen can never pair
    add("b" * (minLen - 1))
    // random background
    for (_ <- 1 to 25)
      add((1 to 40 + r.nextInt(100))
        .map(_ => ('a' + r.nextInt(5)).toChar).mkString)
    val all = docs.result()
    val df = spark.createDataFrame(all).toDF("doc_id", "text")
    val got = SubstrDedup.longRepeatPairs(df, "doc_id", "text", minLen, w)
      .collect().map(row => (row.getLong(0), row.getLong(1))).toSet
    val grams = all.flatMap { case (i, t) =>
      (0 to t.length - minLen).map(p => (t.substring(p, p + minLen), i))
    }
    val brute = (for {
      (g1, i1) <- grams; (g2, i2) <- grams
      if g1 == g2 && i1 < i2
    } yield (i1, i2)).toSet
    assert(got == brute)
    assert(got.contains((1L, 2L)) && got.contains((4L, 5L)))
    assert(!got.exists(p => p._1 == 3L || p._2 == 3L))
    assert(!got.exists(p => p._1 == 6L || p._2 == 6L))
  }

  /** Keep-first cut brute force: char is removed iff covered by some
    * L-gram whose corpus-minimum doc id is smaller than this doc's.
    */
  private def bruteClean(all: Seq[(Long, String)], L: Int)
      : Map[Long, String] = {
    val minId = scala.collection.mutable.Map.empty[String, Long]
    for ((id, t) <- all; p <- 0 to t.length - L) {
      val g = t.substring(p, p + L)
      minId(g) = math.min(minId.getOrElse(g, Long.MaxValue), id)
    }
    all.map { case (id, t) =>
      val cut = new Array[Boolean](t.length)
      for (p <- 0 to t.length - L)
        if (minId(t.substring(p, p + L)) < id)
          for (q <- p until p + L) cut(q) = true
      id -> t.zipWithIndex.collect {
        case (ch, i) if !cut(i) => ch
      }.mkString
    }.toMap
  }

  test("cleanText == keep-first brute force (overlaps, merges, ties)") {
    val r = new Random(67)
    val L = 20
    val boiler = "#" * 5 + "SHARED LICENSE BLOCK 0123456789" // 36 > L
    val all = Seq(
      (3L, "aaa" + boiler + "zzz"), // min id: keeps the run
      (7L, boiler),                 // entire doc cut
      (9L, "x" + boiler + "y" + boiler), // two cuts, merge check
      (11L, boiler.take(L - 1) + "Q" + boiler.take(L - 1)), // no full gram
      (20L, (1 to 80).map(_ => ('a' + r.nextInt(3)).toChar).mkString),
      (21L, (1 to 80).map(_ => ('a' + r.nextInt(3)).toChar).mkString)
    ) ++ (30L to 45L).map(i => (i,
      (1 to 25 + r.nextInt(60)).map(_ => ('a' + r.nextInt(4)).toChar)
        .mkString))
    val df = spark.createDataFrame(all).toDF("doc_id", "text")
    val got = SubstrDedup.cleanText(df, "doc_id", "text", L)
      .collect().map(row => row.getLong(0) -> row.getString(1)).toMap
    assert(got == bruteClean(all, L))
    assert(got(3L) == "aaa" + boiler + "zzz") // keep-first intact
    assert(got(7L) == "")                     // fully shed
  }

  test("scrubAgainstCorpus == brute force; arrival-arrival runs survive") {
    val r = new Random(71)
    val L = 20
    val refBoiler = "### REFERENCE LICENSE BLOCK v2 ###" // 34 >= L
    val arrOnly = "@@ ARRIVAL-ONLY SHARED SEGMENT @@"    // 33 >= L
    val reference = Seq(
      (1L, "ref doc alpha " + refBoiler + " tail"),
      (2L, (1 to 70).map(_ => ('a' + r.nextInt(4)).toChar).mkString))
    val arrivals = Seq(
      (10L, "intro " + refBoiler + " outro"),      // cut the boiler
      (11L, "A" + arrOnly + "B"),                  // shared w/ 12 ONLY
      (12L, "C" + arrOnly + "D"),                  // -> both keep it
      (13L, (1 to 50).map(_ => ('e' + r.nextInt(4)).toChar).mkString),
      (14L, refBoiler))                            // fully shed
    val refDf = spark.createDataFrame(reference).toDF("doc_id", "text")
    val arrDf = spark.createDataFrame(arrivals).toDF("doc_id", "text")
    val got = SubstrDedup
      .scrubAgainstCorpus(arrDf, refDf, "doc_id", "text", L)
      .collect().map(row => row.getLong(0) -> row.getString(1)).toMap
    // brute: cut iff the L-gram occurs anywhere in the reference
    val refGrams = reference.flatMap { case (_, t) =>
      (0 to t.length - L).map(p => t.substring(p, p + L))
    }.toSet
    val brute = arrivals.map { case (id, t) =>
      val cut = new Array[Boolean](t.length)
      for (p <- 0 to t.length - L)
        if (refGrams(t.substring(p, p + L)))
          for (q <- p until p + L) cut(q) = true
      id -> t.zipWithIndex.collect {
        case (ch, i) if !cut(i) => ch
      }.mkString
    }.toMap
    assert(got == brute)
    assert(got(11L) == "A" + arrOnly + "B",
      "arrival-to-arrival sharing must NOT be cut")
    assert(got(12L) == "C" + arrOnly + "D")
    assert(got(14L) == "")
    assert(!got(10L).contains("LICENSE"))
  }

  test("longRepeatPairs on randomized corpora with planted structure") {
    val r = new Random(59)
    val minLen = 25; val w = 6
    for (trial <- 1 to 5) {
      val shared = (1 to minLen + r.nextInt(10))
        .map(_ => ('a' + r.nextInt(26)).toChar).mkString
      val all = (1L to 20L).map { i =>
        val t = (1 to 30 + r.nextInt(60))
          .map(_ => ('a' + r.nextInt(4)).toChar).mkString
        if (i % 4 == 0) (i, t.take(5) + shared + t.drop(5)) else (i, t)
      }
      val df = spark.createDataFrame(all).toDF("doc_id", "text")
      val got = SubstrDedup
        .longRepeatPairs(df, "doc_id", "text", minLen, w)
        .collect().map(row => (row.getLong(0), row.getLong(1))).toSet
      val grams = all.flatMap { case (i, t) =>
        (0 to t.length - minLen).map(p => (t.substring(p, p + minLen), i))
      }
      val brute = (for {
        (g1, i1) <- grams; (g2, i2) <- grams
        if g1 == g2 && i1 < i2
      } yield (i1, i2)).toSet
      assert(got == brute, s"trial $trial")
    }
  }
}
