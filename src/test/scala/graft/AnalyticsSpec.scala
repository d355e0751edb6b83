package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

/** Semantic contracts for the Analytics pack on hostile fixtures the
  * driver data can't guarantee to contain: funnel events out of order,
  * sessions spanning midnight, zero-length sessions, end==start instants,
  * length-bucket straddlers and distance ties for the banded edit-distance
  * join. The oracle gate checks values on driver data; these pin the
  * CONTRACTS (and the banding equivalence) on adversarial inputs.
  */
class AnalyticsSpec extends SparkSpec {

  import spark.implicits._

  private val DayUs = 86400000000L
  private def mins(m: Long): Long = m * 60L * 1000000L // micros

  /** Write a fixture dir readable by Tables.load: events.ts is raw NANOS
    * (the driver's parquet layout), other tables plain.
    */
  private lazy val dir: String = {
    val d = Files.createTempDirectory("analytics_fixture").toString
    // events: (user, micros, type). Day 0 = epoch day 0; 30-min session
    // gap. u1 has a click BEFORE its first view plus a complete chain
    // after it; u2's only click comes after its purchase; u3 completes
    // backwards only. u10/u11/u12/u13 shape the concurrency fixture:
    //   u10: [10, 20] min on day 2     u11: point at 15 on day 2
    //   u12: point at 20 on day 2 (== u10's end instant)
    //   u13: 23:50 d0 → 00:10 d1 (one session spanning midnight)
    // (u10-u12 live on day 2 so day-0 concurrency stays hand-countable
    // from the funnel users alone.)
    val events = Seq(
      (1L, mins(10), "click"), (1L, mins(12), "view"),
      (1L, mins(14), "click"), (1L, mins(16), "purchase"),
      (2L, mins(10), "view"), (2L, mins(12), "purchase"),
      (2L, mins(14), "click"),
      (3L, mins(10), "purchase"), (3L, mins(12), "click"),
      (3L, mins(14), "view"),
      (10L, mins(2 * 24 * 60 + 10), "view"),
      (10L, mins(2 * 24 * 60 + 20), "view"),
      (11L, mins(2 * 24 * 60 + 15), "view"),
      (12L, mins(2 * 24 * 60 + 20), "view"),
      (13L, mins(23 * 60 + 50), "view"), (13L, mins(24 * 60 + 10), "view"))
      .toDF("user_id", "us", "event_type")
      .select(col("us").as("event_id"), (col("us") * 1000L).as("ts"),
        col("user_id"), col("event_type"))
    events.write.mode("overwrite").parquet(s"$d/events.parquet")

    // orders: month streaks incl. a year boundary (Dec 1995 → Jan 1996)
    // and a duplicate order inside one month (must collapse).
    val orders = Seq(
      (1L, "1995-01-15"), (1L, "1995-01-20"), (1L, "1995-02-01"),
      (1L, "1995-03-31"), (1L, "1995-05-10"),
      (2L, "1995-12-25"), (2L, "1996-01-05"),
      (3L, "1997-07-04"))
      .toDF("o_custkey", "d")
      .select(col("o_custkey"), to_timestamp(col("d")).as("o_orderdate"))
    orders.write.mode("overwrite").parquet(s"$d/orders.parquet")

    // documents: heads straddling the 16-char buckets (15 vs 27 chars =
    // len diff 12, buckets 0 vs 1), a tie in distance (3 equidistant
    // neighbors), a pair just over the 12-char length gate, and a
    // cross-source pair that must NOT match.
    val documents = Seq(
      (1L, "aaaaaaaaaaaaaaa", "en", "s1"), // 15 chars, bucket 0
      (2L, "aaaaaaaaaaaaaaabbbbbbbbbbbb", "en", "s1"), // 27, bucket 1
      (3L, "aaaaaaaaaaaaaaac", "en", "s1"), // 16, bucket 1
      (4L, "cccccccc", "en", "s2"), (5L, "cccccccd", "en", "s2"),
      (6L, "ccccccce", "en", "s2"), (7L, "cccccccf", "en", "s2"),
      (8L, "ddddd", "en", "s3"),
      (9L, "dddddddddddddddddd", "en", "s3"), // diff 13 > 12: excluded
      (10L, "eeeee", "en", "s4"), (11L, "eeeee", "fr", "s4"))
      .toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars", length(col("text")))
    documents.write.mode("overwrite").parquet(s"$d/documents.parquet")
    d
  }

  private def q(name: String) =
    SparkEntry.queries(name)(spark, dir)

  test("e11 stepwise funnel respects event order, unlike first-touch") {
    val rows = q("e11_stepwise_funnel").collect()
      .map(r => r.getLong(0) ->
        (r.isNullAt(2), r.isNullAt(3), r.getBoolean(4))).toMap
    // u1: click@10 < view@12, but click@14 then purchase@16 complete the
    // stepwise chain (first-touch e04 would call u1 incomplete).
    assert(rows(1L) == ((false, false, true)))
    // u2: only click (14) comes after its purchase (12): no purchase
    // after the click → incomplete, though all three types are present.
    assert(rows(2L) == ((false, true, false)))
    // u3: strictly reversed — no click after the view at all.
    assert(rows(3L) == ((true, true, false)))
  }

  test("e12 cohorts: offsets anchor at each user's first day") {
    val rows = q("e12_retention_cohorts").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    // day-0 cohort: u1/u2/u3/u13 first-active on day 0; only u13 returns
    // on day 1; u10/u11/u12 form the day-2 cohort.
    assert(rows((0L, 0L)) == 4L)
    assert(rows((0L, 1L)) == 1L)
    assert(rows((2L, 0L)) == 3L)
    assert(rows.keys.forall(_._2 >= 0L), "offsets are never negative")
  }

  test("e13 concurrency: ties, zero-length and midnight spans") {
    val rows = q("e13_max_concurrency").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // day 0: funnel users u1 [10,16], u2 [10,14], u3 [10,14] overlap →
    // peak 3 (u13's lone 23:50 session adds 1). day 1: u13's tail → 1.
    // day 2: u10's [10,20] overlaps u11's point-session at 15 AND u12's
    // point-session at u10's inclusive end instant (20) → peak 2; the
    // zero-length sessions never read as a third concurrent.
    assert(rows == Map(0L -> 3L, 1L -> 1L, 2L -> 2L))
  }

  test("e13 equals a brute-force interval sweep on randomized sessions") {
    // independent oracle: sessionize + clip + count in plain Scala over
    // a seeded random corpus, then compare per-day maxima exactly.
    val rnd = new scala.util.Random(42)
    val raw = (0 until 200).map { _ =>
      val user = rnd.nextInt(5).toLong
      val us = (rnd.nextLong(3L * DayUs / mins(1)) * mins(1)) +
        rnd.nextInt(60) * 1000000L
      (user, us)
    }
    val d2 = Files.createTempDirectory("analytics_sweep").toString
    raw.toDF("user_id", "us")
      .select(col("us").as("event_id"), (col("us") * 1000L).as("ts"),
        col("user_id"), lit("view").as("event_type"))
      .write.mode("overwrite").parquet(s"$d2/events.parquet")

    val gap = mins(30)
    val intervals = raw.groupBy(_._1).values.flatMap { evs =>
      val ts = evs.map(_._2).sorted
      val sessions = ts.tail.foldLeft(List(List(ts.head))) { (acc, t) =>
        if (t - acc.head.head > gap) List(t) :: acc
        else (t :: acc.head) :: acc.tail
      }
      sessions.map(s => (s.min, s.max + 1)) // half-open [ss, se+1)
    }.toSeq
    val expected = intervals
      .flatMap { case (ss, se) =>
        ((ss / DayUs) to ((se - 1) / DayUs)).map { d =>
          (d, math.max(ss, d * DayUs), math.min(se, (d + 1) * DayUs))
        }
      }
      .groupBy(_._1)
      .map { case (day, clips) =>
        val peak = clips.map(_._2).distinct.map { t =>
          clips.count(c => c._2 <= t && t < c._3)
        }.max
        day -> peak.toLong
      }
    val got = SparkEntry.queries("e13_max_concurrency")(spark, d2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == expected)
  }

  test("w08 streaks: year boundary joins, same-month orders collapse") {
    val rows = q("w08_order_streaks").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3)))).toMap
    assert(rows(1L) == ((3L, 2L, 4L))) // Jan–Mar + May; dup Jan collapses
    assert(rows(2L) == ((2L, 1L, 2L))) // Dec 1995 → Jan 1996 is one run
    assert(rows(3L) == ((1L, 1L, 1L)))
  }

  test("d40 capped NN equals the naive quadratic join under the contract") {
    // the contract: nearest same-(lang, source) neighbor within edit
    // distance 6, heads of at least 6 chars, min(struct) tie-break
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), col("lang"), col("source"),
        substring(col("text"), 1, 120).as("head"))
      .filter(length(col("head")) >= 6)
    val naive = docs.as("a").crossJoin(docs.as("b"))
      .filter(col("a.lang") === col("b.lang") &&
        col("a.source") === col("b.source") &&
        col("a.doc_id") =!= col("b.doc_id"))
      .select(col("a.doc_id").as("doc_id"), col("b.doc_id").as("nn"),
        levenshtein(col("a.head"), col("b.head")).as("d"))
      .filter(col("d") <= 6)
      .groupBy(col("doc_id"))
      .agg(min(struct(col("d"), col("nn"))).as("best"))
      .select(col("doc_id"), col("best.nn").as("nn_id"),
        col("best.d").as("nn_dist"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val capped = q("d40_edit_nn").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(capped == naive)
    // the hostile cases actually exercised what they claim:
    val byDoc = capped.map(t => t._1 -> ((t._2, t._3))).toMap
    assert(byDoc(1L) == ((3L, 1L)),
      "15- vs 16-char near-pair found (length straddle)")
    assert(byDoc(3L) == ((1L, 1)), "and in the reverse direction")
    assert(!byDoc.contains(2L),
      "doc2's closest neighbor sits at distance 12 — outside the cap")
    // docs 4-7 are 8-char strings with ONE distinct 6-gram each — the
    // short class whose gram bound is vacuous; the length-banded side
    // path must pair them and the dist-tie breaks to the smallest id
    assert(byDoc(4L) == ((5L, 1L)),
      "short-class distance tie broken by smallest doc_id")
    assert(byDoc(5L) == ((4L, 1L)) && byDoc(6L) == ((4L, 1L)) &&
      byDoc(7L) == ((4L, 1L)), "short-class neighbors all found")
    assert(!byDoc.contains(8L),
      "sub-6-char head excluded by the documented floor")
    assert(!byDoc.contains(9L), "no partner inside the cap")
    assert(!byDoc.contains(10L) && !byDoc.contains(11L),
      "cross-lang docs never pair")
  }

  test("e14 lags anchor at first view; pre-view purchases never qualify") {
    val rows = q("e14_conversion_lag").collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    // u1: view@12 → purchase@16 = 240 s (its pre-view click@10 is
    // irrelevant here); u2: view@10 → purchase@12 = 120 s (converts
    // for e14 even though e11's stepwise chain fails — clicks later);
    // u3: purchase precedes the first view → excluded entirely
    assert(rows == Map(0L -> ((2L, 120L, 240L, 360L))))
  }

  test("d42 clusters the fixture by edit-distance and picks min-id survivors") {
    val rows = q("d42_edit_dedup_survivors").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getBoolean(2)))).toMap
    // docs 4-7 are a 4-clique at dist ≤ 2 (short class): one component
    // labeled by the smallest id, which is the only survivor
    assert(rows(4L) == ((4L, true)))
    assert(rows(5L) == ((4L, false)) && rows(6L) == ((4L, false)) &&
      rows(7L) == ((4L, false)))
    // docs 1,3 pair at dist 1; doc 2 is 12 edits away → singleton
    assert(rows(1L) == ((1L, true)) && rows(3L) == ((1L, false)))
    assert(rows(2L) == ((2L, true)))
    // "ddddd" sits exactly AT the q=5 floor (included) but 5 edits from
    // everything → singleton; docs 10/11 are byte-identical heads in
    // different langs — d42 clusters corpus-wide (no lang blocking, by
    // design: exact duplicates are duplicates across languages)
    assert(rows(8L) == ((8L, true)))
    assert(rows(10L) == ((10L, true)) && rows(11L) == ((10L, false)))
    assert(rows.size == 11 && rows.values.count(_._2) == 6)
  }
}
