package graft

import org.apache.spark.sql.execution.ExplainMode

/** Plan-regression guards: the scale-critical physical-plan properties
  * PLANS.md documents, asserted so a refactor can't silently trade a
  * broadcast for a shuffle or lose a pushed filter. Runs on sf0.001
  * (plan shape, not data volume, is what's under test; join-strategy
  * thresholds behave the same way).
  */
class PlanGuardSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, dir)
      .queryExecution.explainString(ExplainMode.fromString("formatted"))

  test("dimension chains broadcast; no sort-merge join at dimension scale") {
    val p = plan("q02_revenue_by_region")
    assert(p.contains("BroadcastHashJoin"), p.take(400))
    assert(!p.contains("SortMergeJoin"), p.take(400))
  }

  test("EXISTS decorrelates to a broadcast left-semi join with pushdown") {
    val p = plan("q24_exists_subquery")
    assert(p.contains("BroadcastHashJoin") && p.contains("LeftSemi"))
    assert(p.contains("GreaterThan(o_totalprice,200000.0)"),
      "filter must reach the parquet scan")
  }

  test("top-k per group and latest-per-key use WindowGroupLimit") {
    assert(plan("q07_topk_per_group").contains("WindowGroupLimit"))
    assert(plan("q26_window_dedup").contains("WindowGroupLimit"))
  }

  // formatted mode prints one "(n) Exchange" line per shuffle node
  // ("(n) BroadcastExchange" doesn't match — broadcasts are fine)
  private def shuffleCount(p: String): Int =
    "\\(\\d+\\) Exchange".r.findAllIn(p).length

  test("as-of join is a single shuffle (no M-by-N range intermediate)") {
    val p = plan("r05_asof_join")
    assert(shuffleCount(p) == 1, s"expected 1 shuffle:\n${p.take(400)}")
    assert(!p.contains("NestedLoop") && !p.contains("CartesianProduct"))
  }

  test("aggregation prunes columns at the scan") {
    val p = plan("q01_pricing_summary")
    assert(p.contains("ReadSchema"))
    assert(!p.contains("l_partkey") && !p.contains("l_suppkey"),
      "unused columns must not reach the scan")
  }

  test("selective filters reach the parquet scan") {
    val p = plan("q06_filtered_revenue")
    assert(p.contains("PushedFilters"))
    assert(p.contains("GreaterThanOrEqual(l_discount"), p.take(600))
  }

  test("scalar-subquery threshold is broadcast, fact side streams once") {
    val p = plan("q25_scalar_subquery")
    assert(p.contains("BroadcastNestedLoopJoin"))
    // the single-row aggregate is the build side; the fact scan must not shuffle
    assert(shuffleCount(p) <= 1, p.take(400))
  }

  test("no query plans a cartesian product except the pair generators") {
    // exempt: deliberate sampled pair generators (documented O(n²) on a
    // pre-filtered set) and trainer queries whose plan CONSTRUCTION runs
    // driver-side iterations (k-means / label propagation) — too slow to
    // sweep here and plan-checked by their own operator specs
    val exempt = Set("d08_char_jaccard_pairs", "d09_ngram_jaccard_pairs",
      "s06_cosine_pairs_exact", "f01_levenshtein",
      "d11_dedup_survivors", "s05_ivf_topk", "s07_pq_topk",
      "s08_ivfpq_topk", "s09_opq_topk")
    val offenders = SparkEntry.queries.keys.toSeq.sorted
      .filterNot(exempt)
      .filter(name => plan(name).contains("CartesianProduct"))
    assert(offenders.isEmpty, s"unexpected cartesian products: $offenders")
  }

  test("bloom-pruned join probes the filter on the fact side map-stage") {
    val p = plan("j04_bloom_prune_join")
    assert(p.contains("might_contain"), "bloom probe missing from plan")
    // the probe must be a plain Filter over the lineitem scan — i.e.
    // appear in the plan, with the join above it and no cartesian
    assert(!p.contains("CartesianProduct"))
  }

  test("content-hash sampling is a pure map-side projection (no shuffle)") {
    val p = plan("d14_hash_sample")
    assert(shuffleCount(p) == 0, s"sampling must not shuffle:\n${p.take(400)}")
  }

  test("sequence packing windows per shard, never a global sort") {
    val p = plan("d17_seq_packing")
    assert(p.contains("Window"))
    assert(!p.contains("Exchange SinglePartition"),
      "packing must partition by shard, not collapse to one partition")
  }

  test("global ranks never collapse to a single-partition window") {
    // w02's two-pass rank must window by the range bucket — a global
    // `Window.orderBy` plans `Exchange SinglePartition` under WindowExec
    // (the 100×-scale killer VERDICT r3 flagged)
    val p = plan("w02_ntile_pctrank")
    assert(p.contains("Window"), p.take(400))
    assert(!p.contains("Exchange SinglePartition"),
      "w02 must partition its window by the range bucket")
  }

  test("mixture-weight rates avoid the whole-frame window path entirely") {
    val p = plan("d19_mixture_weights")
    assert(!p.contains("Window"),
      "d19 grand totals must be a broadcast 1-row aggregate, not a window")
  }

  test("repetition fraction is a pure map-side projection (no shuffle)") {
    val p = plan("d25_dup_ngram_frac")
    assert(shuffleCount(p) == 0,
      s"d25 must not shuffle:\n${p.take(400)}")
  }

  test("rarest-token argmin and source caps window by key, never globally") {
    for (q <- Seq("d26_rarest_token", "d27_source_cap_sample")) {
      val p = plan(q)
      assert(p.contains("Window"), s"$q should use a window")
      assert(!p.contains("Exchange SinglePartition"),
        s"$q must never collapse a window to one partition")
    }
  }

  test("TPC-H multi-join pipelines broadcast every dimension") {
    for (q <- Seq("t01_regional_supplier_volume", "t02_nation_pair_volume",
      "t03_returned_item_report", "t04_market_share",
      "t05_product_profit")) {
      val p = plan(q)
      assert(p.contains("BroadcastHashJoin"), s"$q missing broadcast")
      // only the fact-fact joins (lineitem⋈orders, orders⋈customer) may
      // shuffle-sort; every dimension must ride a broadcast
      val smj = "\\(\\d+\\) SortMergeJoin".r.findAllIn(p).length
      assert(smj <= 2, s"$q has $smj sort-merge joins (dims must broadcast)")
    }
  }

  test("Q2 shape: correlated min-subquery decorrelates, dims broadcast") {
    val p = plan("t07_min_price_supplier")
    assert(p.contains("BroadcastHashJoin"), "dimensions must broadcast")
    assert(!p.contains("CartesianProduct") && !p.contains("NestedLoop"),
      "the correlated subquery must decorrelate to an aggregate+join")
  }

  test("Q20 shape: aggregated subquery feeds a semi-join, dims broadcast") {
    val p = plan("t08_qualified_suppliers")
    assert(p.contains("LeftSemi"), "IN (aggregated subquery) must plan a semi-join")
    assert(p.contains("BroadcastHashJoin"), "part/nation must broadcast")
    assert(!p.contains("CartesianProduct"))
  }

  test("Q21 shape: EXISTS and NOT EXISTS decorrelate to semi + anti self-joins") {
    val p = plan("t09_sole_blame_supplier")
    assert(p.contains("LeftSemi"), "EXISTS must plan a left-semi join")
    assert(p.contains("LeftAnti"), "NOT EXISTS must plan a left-anti join")
    assert(!p.contains("CartesianProduct"))
  }

  test("Q11 shape: the global threshold filters group output, no join") {
    val p = plan("t10_important_parts")
    // Catalyst injects the uncorrelated scalar subquery as a runtime
    // literal in a Filter ABOVE the group-by — no join node exists, and
    // the groups stream through one partial+final aggregate pair
    assert(p.contains("Subquery") || p.contains("subquery"), p.take(400))
    assert(!p.contains("Join") && !p.contains("CartesianProduct"),
      "the HAVING threshold must not plan any join")
  }

  test("Q14 shape: conditional ratio broadcasts part, one final shuffle") {
    val p = plan("t12_promo_revenue")
    assert(p.contains("BroadcastHashJoin"), "part must broadcast")
    assert(shuffleCount(p) <= 1,
      s"global agg should be the only exchange:\n${p.take(400)}")
  }

  test("Q15 shape: max-revenue equality probes broadcasts, no SMJ") {
    val p = plan("t13_top_supplier")
    assert(p.contains("BroadcastHashJoin"),
      "the one-row max and supplier dim must broadcast")
    assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct"),
      "nothing in the aggregated view may shuffle-sort")
  }

  test("Q17 shape: correlated avg decorrelates to aggregate + join") {
    val p = plan("t14_small_qty_revenue")
    assert(p.contains("BroadcastHashJoin"), "filtered part must broadcast")
    assert(!p.contains("CartesianProduct") && !p.contains("NestedLoop"),
      "the correlated avg subquery must decorrelate")
  }

  test("Q19 shape: disjunctive predicates keep the equi-join, no cartesian") {
    val p = plan("t15_disjunctive_parts")
    assert(p.contains("BroadcastHashJoin"), "part must broadcast")
    assert(!p.contains("CartesianProduct") && !p.contains("NestedLoop"),
      "the OR-of-conjunctions must stay a residual on the equi-join")
  }

  test("Q12 shape: conditional counts ride partial aggs on the join spine") {
    val p = plan("t16_priority_class_counts")
    // the CASE-sums must combine map-side (partial HashAggregate below
    // the final exchange), and nothing may plan a cartesian
    assert("\\(\\d+\\) HashAggregate".r.findAllIn(p).length >= 2,
      s"expected partial+final aggregates:\n${p.take(400)}")
    assert(!p.contains("CartesianProduct") && !p.contains("NestedLoop"))
  }

  test("Q16 shape: NOT IN plans a broadcast anti-join, part broadcasts") {
    val p = plan("t17_part_supplier_counts")
    assert(p.contains("LeftAnti"), "NOT IN must plan an anti-join")
    assert(p.contains("BroadcastHashJoin"), "part/supplier must broadcast")
    assert(!p.contains("CartesianProduct") && !p.contains("SortMergeJoin"),
      "nothing at dimension scale may shuffle-sort")
  }

  test("Q18 shape: the HAVING rollup pre-shrinks the join, no cartesian") {
    val p = plan("t18_large_volume_customers")
    assert("\\(\\d+\\) HashAggregate".r.findAllIn(p).length >= 2,
      s"quantity rollup must be partial+final:\n${p.take(400)}")
    assert(!p.contains("CartesianProduct") && !p.contains("NestedLoop"))
    assert(!p.contains("Exchange SinglePartition"),
      "nothing in the Q18 pipeline may collapse to one partition")
  }

  test("bucketed fact-fact join plans zero exchanges beneath the spine") {
    // t19 re-runs t02's Q7 aggregation over lineitem/orders written as
    // 8-bucket tables on the order key: the co-located sort-merge join
    // must consume bucket layout directly — the ONLY exchange in the
    // whole plan is the final group-by (at 100 TB this is the dominant
    // shuffle of every fact-fact join, removed by layout)
    val p = plan("t19_bucketed_join_volume")
    assert(p.contains("SortMergeJoin"), "the spine join should sort-merge")
    assert(p.contains("BroadcastHashJoin"), "dimensions must broadcast")
    assert(shuffleCount(p) == 1,
      s"only the final aggregation may shuffle:\n${p.take(600)}")
  }

  test("bucketed deletion-index self-join consumes bucket layout, one shuffle") {
    // d43 stores the k=1 deletion-variant index as an 8-bucket catalog
    // table hashed+sorted on _key: the self-join must read bucket
    // layout directly — no exchange and no sort beneath the join; the
    // only shuffle in the plan is the surviving pairs' distinct
    val p = plan("d43_edit_pairs_bucketed")
    assert(p.contains("SortMergeJoin"), "the index join should sort-merge")
    assert(shuffleCount(p) == 1,
      s"only the pair distinct may shuffle:\n${p.take(600)}")
  }

  test("vocab overlap joins on the shingle, sizes broadcast") {
    val p = plan("d29_source_vocab_overlap")
    assert(p.contains("BroadcastHashJoin"),
      "the #sources-row vocabulary-size frames must broadcast")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("Exchange SinglePartition"), p.take(400))
  }

  test("frequency spectrum is two partial-agg shuffles, nothing else") {
    val p = plan("d30_token_freq_spectrum")
    assert(shuffleCount(p) == 2,
      s"expected exactly (token) then (freq) exchanges:\n${p.take(400)}")
  }

  test("mixture entropy broadcasts the per-lang totals, no window") {
    val p = plan("d31_mixture_entropy")
    assert(p.contains("BroadcastHashJoin"), "totals must broadcast")
    assert(!p.contains("Window"), "entropy must not plan a window")
  }

  test("global quantiles window only located sub-buckets, keyed by (p, bkt2)") {
    val p = plan("w06_global_quantiles")
    assert("windowspecdefinition\\([^)]*p#\\d+, _b2#\\d+".r
      .findFirstIn(p).isDefined,
      s"the rank window must partition by (…, p, _b2):\n${p.take(600)}")
    assert(p.contains("BroadcastHashJoin"),
      "the located frames must broadcast against the buckets")
    assert(!p.contains("CartesianProduct"), p.take(400))
  }

  test("attribution as-ofs are dedup + one window shuffle, nothing more") {
    for (q <- Seq("e09_last_click_attribution",
      "e10_next_purchase_latency")) {
      val p = plan(q)
      assert(shuffleCount(p) <= 2,
        s"$q: dedup + as-of window only:\n${p.take(400)}")
      assert(!p.contains("CartesianProduct") && !p.contains("NestedLoop"),
        s"$q: the tolerance must not plan a range join")
      assert(!p.contains("Exchange SinglePartition"),
        s"$q: the as-of window must partition by user")
    }
  }

  test("grouped median windows per (grp, bkt), offsets per grp") {
    val p = plan("w07_grouped_median")
    assert(p.contains("BroadcastHashJoin"),
      "stats/located frames must broadcast")
    assert(!p.contains("Exchange SinglePartition"),
      "nothing in the grouped-median plan may collapse to one partition")
    assert(!p.contains("CartesianProduct"), p.take(400))
  }

  test("token entropy is two partial-agg shuffles carrying token pairs") {
    val p = plan("d32_token_entropy")
    assert(shuffleCount(p) == 2,
      s"expected (doc,token) then (doc) exchanges:\n${p.take(400)}")
  }

  test("LM scoring joins the vocab table on the token, no cartesian") {
    val p = plan("d34_lm_score")
    // the one-row totals frame rides a BroadcastNestedLoopJoin (q25
    // precedent); the vocabulary join must be a real equi-join
    assert(!p.contains("CartesianProduct"), p.take(400))
    assert(p.contains("BroadcastNestedLoopJoin"),
      "the one-row totals must broadcast")
  }

  test("weighted sample is a distributed TakeOrdered, never a full sort") {
    val p = plan("d33_weighted_sample")
    assert(p.contains("TakeOrderedAndProject"),
      s"global top-k must plan map-side heaps:\n${p.take(400)}")
    assert(!p.contains("Exchange SinglePartition"),
      "the sample must not collapse to one partition")
  }

  test("SCD2 intervals window by user, never a single partition") {
    val p = plan("e08_scd2_intervals")
    assert(p.contains("Window"), p.take(400))
    assert(!p.contains("Exchange SinglePartition"),
      "the interval close must partition by user_id")
  }

  test("Q22 shape: scalar-avg threshold + NOT EXISTS anti-join") {
    val p = plan("t11_dormant_rich_customers")
    assert(p.contains("LeftAnti"), "NOT EXISTS must plan a left-anti join")
    assert(!p.contains("CartesianProduct"))
  }
}
