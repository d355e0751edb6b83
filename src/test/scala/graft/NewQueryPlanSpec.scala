package graft

/** Plan-shape pins for the round-8 queries: the scans must prune to the
  * referenced columns (a corpus scan that drags `text` where only ids
  * flow, or all 5 document columns for a 2-column projection, is the
  * 100 TB defect PlanGuard's cartesian/window checks don't see).
  */
class NewQueryPlanSpec extends SparkSpec {

  private def plan(name: String): String = {
    val df = SparkEntry.queries(name)(spark, "/root/testdata/sf0.001")
    df.queryExecution.executedPlan.toString
  }

  test("d38 scans documents with only doc_id and text") {
    val p = plan("d38_exact_span_residual")
    assert(p.contains("ReadSchema"))
    // every parquet scan of documents must read at most doc_id, text
    val reads = "ReadSchema: struct<([^>]*)>".r
      .findAllMatchIn(p).map(_.group(1)).toSeq
    assert(reads.nonEmpty)
    reads.foreach { r =>
      val cols = r.split(",").map(_.takeWhile(_ != ':').trim).toSet
      assert(cols.subsetOf(Set("doc_id", "text")), s"over-wide scan: $r")
    }
  }

  test("s15 scans prune to doc_id/text and broadcast the stats sides") {
    val p = plan("s15_bm25_scores")
    val reads = "ReadSchema: struct<([^>]*)>".r
      .findAllMatchIn(p).map(_.group(1)).toSeq
    reads.foreach { r =>
      val cols = r.split(",").map(_.takeWhile(_ != ':').trim).toSet
      assert(cols.subsetOf(Set("doc_id", "text")), s"over-wide scan: $r")
    }
    assert(p.contains("BroadcastExchange") || p.contains("BroadcastHashJoin")
      || p.contains("BroadcastNestedLoopJoin"),
      "df/stats sides should broadcast")
  }

  test("d39 keeps the two-level histogram as partial aggregates") {
    val p = plan("d39_dup_cluster_sizes")
    assert(p.contains("HashAggregate"))
    assert(!p.contains("CartesianProduct"))
  }

  private def readCols(p: String): Seq[Set[String]] =
    "ReadSchema: struct<([^>]*)>".r.findAllMatchIn(p)
      .map(_.group(1).split(",").map(_.takeWhile(_ != ':').trim).toSet)
      .toSeq

  test("e11 funnel costs exactly one exchange and a 3-column scan") {
    val p = plan("e11_stepwise_funnel")
    // three chained window minima + the final aggregate all reuse the
    // user_id partitioning: more than one Exchange means a regression
    // re-shuffled what was already co-partitioned
    assert("(?m)^.*Exchange".r.findAllIn(p).size == 1,
      s"expected a single Exchange:\n$p")
    readCols(p).foreach(cols =>
      assert(cols.subsetOf(Set("ts", "user_id", "event_type")),
        s"over-wide scan: $cols"))
  }

  test("e13 sweep scans only ts/user_id and joins nothing") {
    val p = plan("e13_max_concurrency")
    readCols(p).foreach(cols =>
      assert(cols.subsetOf(Set("ts", "user_id")), s"over-wide scan: $cols"))
    assert(!p.contains("Join"), "sweep must be window+agg only")
    // the delta sweep must window per (day, hour-bucket) — the
    // two-level kernel; a day_idx-only sweep window serializes a
    // billion-delta day onto one core
    assert("windowspecdefinition\\(day_idx#\\d+L?, bkt#\\d+L?".r
      .findFirstIn(p).isDefined,
      s"level-1 sweep must partition by (day_idx, bkt):\n${p.take(800)}")
  }

  test("d40 capped NN prunes n_chars and stays an equi-join") {
    val p = plan("d40_edit_nn")
    readCols(p).foreach(cols =>
      assert(cols.subsetOf(Set("doc_id", "text", "lang", "source")),
        s"over-wide scan: $cols"))
    assert(!p.contains("CartesianProduct")
      && !p.contains("BroadcastNestedLoopJoin"),
      "the gram-prefix candidate join must stay keyed")
    // the (lang, source) contract must ride the candidate join KEY —
    // blocked generation — not a post-hoc filter over meta joins
    // gram is the 64-bit hash since r12, so the attribute prints with
    // LongType's L suffix
    assert("gram#\\d+L?, lang#\\d+, source#\\d+".r.findFirstIn(p).isDefined,
      s"gram join must key on (gram, lang, source):\n${p.take(800)}")
  }

  test("d41 deletion-neighborhood join is keyed on the variant hash") {
    val p = plan("d41_edit_pairs")
    readCols(p).foreach(cols =>
      assert(cols.subsetOf(Set("c_custkey", "c_name")),
        s"over-wide scan: $cols"))
    assert(!p.contains("CartesianProduct")
      && !p.contains("BroadcastNestedLoopJoin"),
      "candidates must come from the hashed-variant equi-join")
    // the variant frame is corpus-scaled with a low explode estimate:
    // Catalyst auto-broadcast ~1.3 GB of it through the driver at 100×
    // (found by the r12 sf30 stage-count step). r13: the strategy is a
    // MEASURED decision — EdJoin bounds the variant frame's true bytes
    // from exact length moments; at sf0.001 the bound is far under the
    // cap, so the broadcast plan is the PROVEN-safe fast shape here
    assert(p.contains("BroadcastExchange") || p.contains("BroadcastHashJoin"),
      s"tiny corpus should take the measured-safe broadcast plan:\n" +
        p.take(600))
  }

  test("d41's join falls back to sort-merge when the measured bound " +
      "exceeds the cap") {
    // cap 0 models the at-scale verdict: the SAME operator must pin
    // sort-merge — Catalyst's under-the-line explode estimate must
    // never get to decide (the r12 driver-kill window)
    val cust = Tables.load(spark, "/root/testdata/sf0.001", "customer")
    val p = graft.operators.EdJoin
      .editPairsByDeletion(cust, "c_custkey", "c_name", k = 1,
        broadcastCap = 0L)
      .queryExecution.executedPlan.toString
    assert(!p.contains("BroadcastExchange") &&
      !p.contains("BroadcastHashJoin"),
      s"above-cap corpus must never broadcast the variant frame:\n" +
        p.take(600))
    assert(p.contains("SortMergeJoin"),
      s"expected the pinned sort-merge shape:\n${p.take(600)}")
  }

  test("d42 scans documents once per role with only doc_id/text") {
    val p = plan("d42_edit_dedup_survivors")
    readCols(p).foreach(cols =>
      assert(cols.subsetOf(Set("doc_id", "text")), s"over-wide scan: $cols"))
    assert(!p.contains("CartesianProduct")
      && !p.contains("BroadcastNestedLoopJoin"))
  }

  test("d44 runs hash-first: a semi join gates the gram-string group") {
    val p = plan("d44_repeated_grams")
    readCols(p).foreach(cols =>
      assert(cols.subsetOf(Set("doc_id", "text")), s"over-wide scan: $cols"))
    // pass 1 keeps only repeated hashes; without the LeftSemi the
    // full corpus's gram strings shuffle again (the 3.9 GB sf3 spill)
    assert(p.contains("LeftSemi"),
      s"expected the repeated-hash semi gate:\n${p.take(600)}")
  }

  test("d45 joins winnowed fingerprints on _h, never all positions") {
    val p = plan("d45_long_repeat_pairs")
    readCols(p).foreach(cols =>
      assert(cols.subsetOf(Set("doc_id", "text")), s"over-wide scan: $cols"))
    assert(!p.contains("CartesianProduct")
      && !p.contains("BroadcastNestedLoopJoin"))
    // the candidate frame is localCheckpointed (it feeds two branches),
    // which truncates the visible plan at a LogicalRDD — assert the
    // kernel on the fingerprint relation itself
    val fp = graft.operators.SubstrDedup.fingerprints(
      Tables.load(spark, "/root/testdata/sf0.001", "documents"),
      "doc_id", "text", 59, 20)
    assert(fp.queryExecution.executedPlan.toString
      .contains("winnow_fingerprints"),
      "the fingerprint kernel must be in the plan (not a transform sweep)")
  }

  test("d46's corpus-scaled starts frame must never broadcast") {
    val p = plan("d46_exact_substr_clean")
    readCols(p).foreach(cols =>
      assert(cols.subsetOf(Set("doc_id", "text")), s"over-wide scan: $cols"))
    // Catalyst underestimates the two-level aggregate and, unhinted,
    // auto-broadcasts it: at sf3 that collected ~1 GB to the driver
    // and died on maxResultSize. The hint must keep every join here
    // a distributed build.
    assert(!p.contains("BroadcastExchange")
      && !p.contains("BroadcastHashJoin"),
      s"starts frame broadcast would collect the corpus to the driver:\n${
        p.take(600)}")
    assert(p.contains("LeftSemi"), "hash-first gate missing")
  }

  test("d47 scrub scans prune to doc_id/text/source, no broadcast") {
    val p = plan("d47_scrub_against_corpus")
    readCols(p).foreach(cols =>
      assert(cols.subsetOf(Set("doc_id", "text", "source")),
        s"over-wide scan: $cols"))
    assert(!p.contains("CartesianProduct")
      && !p.contains("BroadcastNestedLoopJoin"))
    // every join side here scales with the corpus (the gram index, the
    // reference texts, the covered-starts aggregate): an auto-broadcast
    // of ANY of them is the estimate-driven driver collect that killed
    // d46 at sf3 — and the unhinted index was indeed planned as a
    // BroadcastExchange build (caught in the r11 plan audit)
    assert(!p.contains("BroadcastExchange")
      && !p.contains("BroadcastHashJoin"),
      s"corpus-scaled frame planned as broadcast:\n${p.take(600)}")
    assert(p.contains("ShuffledHashJoin"),
      s"expected distributed hash builds:\n${p.take(600)}")
  }
}
