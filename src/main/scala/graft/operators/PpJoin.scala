package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact Jaccard set-similarity self-join, candidate-bounded by
  * PPJoin-style prefix filtering (Xiao, Wang, Lin & Yu, "Efficient
  * Similarity Joins for Near Duplicate Detection", WWW 2008).
  *
  * The naive exact join indexes EVERY element of every set: a
  * boilerplate shingle shared by d documents yields d² candidate pairs
  * before the threshold filters — quadratic on the hottest key, a
  * straggler shuffle at corpus scale. Prefix filtering keeps the result
  * EXACT while indexing only a bounded prefix of each set:
  *
  * Fix a global total order O over tokens — ascending corpus document
  * frequency, ties by token value — so the rarest tokens come first and
  * the hot tokens land at the END of every set, outside most prefixes.
  * For threshold t = num/den, J(A,B) ≥ t implies
  * |A∩B| ≥ t·|A∪B| ≥ t·max(|A|,|B|), so the overlap is at least
  * α(n) = ⌈t·n⌉ for EACH side's own size n. The prefix-filter lemma:
  * if |A∩B| ≥ α then the first |A| − α + 1 elements of A under O and
  * the first |B| − α + 1 of B share at least one element (otherwise,
  * walking O, one side exhausts too many non-shared elements to still
  * reach α overlaps). Hence indexing each set's first
  * n − ⌈t·n⌉ + 1 tokens (⌊n/2⌋ + 1 at t = ½) misses NO qualifying
  * pair. A matching-size filter (den·min(na,nb) ≥ num·max — J ≥ t
  * forces the sizes within a factor den/num) and the POSITIONAL
  * filter (paper §3.2; see [[overlapBand]]) prune further: the count
  * and last position of each pair's shared prefix tokens bound the
  * achievable overlap from both sides, so most true near-dups are
  * accepted from prefix evidence alone and most false candidates are
  * rejected exactly — only the undecided band pays the full
  * intersection count, in overflow-free integer form
  * c·(num+den) ≥ num·(na+nb) ⟺ J ≥ num/den.
  *
  * Scale shape: two linear shuffles build the prefix index (a DF count
  * keyed by token, a per-set window keyed by id); the self-join runs
  * over prefixes only — a token with corpus DF d sits inside the prefix
  * of few sets (rare tokens) or almost none (hot tokens), so no key
  * explodes quadratically; verification materializes full token arrays
  * ONLY for candidate ids (semi-join prune first).
  */
object PpJoin {

  /** True iff xxhash64 is INJECTIVE on this corpus's token vocabulary:
    * one aggregation comparing the distinct-token count with the
    * distinct-hash count over the same vocabulary. The audit is what
    * turns hash-space execution from "exact with probability 1 − 2⁻⁶⁴"
    * into exact, period — Jaccard (set sizes, intersections, DF-order
    * prefixes, the o-acceptance shortcut) is invariant under ANY
    * injection of the element space, and the audit PROVES injectivity
    * on the tokens actually present rather than appealing to collision
    * odds. This matters specifically for PPJoin because its positional
    * filter ACCEPTS pairs from prefix-overlap evidence alone, without a
    * later string-verification step to absorb a collision (the reason
    * d24 originally pinned raw shingle strings as join keys while
    * EdJoin/winnowing could hash freely).
    *
    * Cost: one count-distinct pass over the vocabulary — the ONE
    * remaining string-keyed exchange, shipping each distinct token once
    * per map partition. It buys 8-byte keys through every hot stage:
    * the per-set rarity sort compares (long, long) instead of
    * (long, 40-char string), the prefix self-join probes longs, and
    * band verification intersects long arrays instead of string arrays.
    */
  private[graft] def hashInjective(e: DataFrame, tokCol: String): Boolean = {
    // null tokens are excluded from the audit because they are excluded
    // from the join itself (see the entry-point filters): counting the
    // null vocabulary row would let a null corpus pass the audit while
    // xxhash64(null) — which yields the non-null seed, not null —
    // silently turned never-matching tokens into joinable values
    val r = e.select(col(tokCol)).filter(col(tokCol).isNotNull).distinct()
      .agg(count(lit(1)), count_distinct(xxhash64(col(tokCol))))
      .head()
    r.getLong(0) == r.getLong(1)
  }

  /** Session-keyed memo of audit verdicts, matched by `sameResult` on
    * the analyzed input plan — the FrameCache discipline applied to a
    * boolean: d24/d36/d37/d39 all audit the SAME session-cached shingle
    * frame, and the corpus's injectivity verdict is a fact about that
    * frame, so re-running the count-distinct pass per query would bill
    * the small-SF bench ~0.4 s × 4 for information it already has.
    * Bounded per session (latest 16 plans), pruned with the session.
    */
  private val auditMemo = scala.collection.mutable.Map.empty[
    org.apache.spark.sql.SparkSession,
    List[(org.apache.spark.sql.catalyst.plans.logical.LogicalPlan,
      Boolean)]]

  private def injectiveMemo(e: DataFrame, tokCol: String): Boolean = {
    val s = e.sparkSession
    val plan = e.queryExecution.analyzed
    val hit = auditMemo.synchronized {
      auditMemo.filterInPlace((sess, _) => !sess.sparkContext.isStopped)
      auditMemo.getOrElse(s, Nil).find(_._1.sameResult(plan)).map(_._2)
    }
    hit.getOrElse {
      // the audit job runs OUTSIDE the monitor (cluster work never
      // holds a lock); a racing duplicate is deterministic-idempotent
      val v = hashInjective(e, tokCol)
      auditMemo.synchronized {
        auditMemo(s) = ((plan, v) ::
          auditMemo.getOrElse(s, Nil).filterNot(_._1.sameResult(plan)))
          .take(16)
      }
      v
    }
  }

  /** Token frame re-keyed to 64-bit hashes when that is provably exact
    * (string tokens, injective hash — see [[hashInjective]]); returned
    * unchanged otherwise, so non-string tokens and the (never yet
    * observed) colliding corpus run the original element space. */
  private def maybeHashed(e: DataFrame, tokCol: String): DataFrame =
    if (e.schema(tokCol).dataType ==
          org.apache.spark.sql.types.StringType &&
        injectiveMemo(e, tokCol))
      e.withColumn(tokCol, xxhash64(col(tokCol)))
    else e

  /** The keyed prefix-filter core shared by the self-join and bipartite
    * paths: sets are keyed by `setKeys` (id, or side+id), the total
    * token order comes from the provided `dfreq` frame — the lemma only
    * requires every prefix to be drawn from ONE fixed order, so the
    * bipartite variant passes a union-corpus DF count here.
    */
  /** Thresholds must be a proper fraction in (0, 1]: num ≥ 1 rules out
    * the degenerate t = 0 ("every token-sharing pair qualifies" is not
    * an exact-join contract), den ≥ num keeps prefixes non-negative.
    */
  private def requireThreshold(num: Int, den: Int): Unit =
    require(num >= 1 && den >= num,
      s"threshold num/den must satisfy 1 <= num <= den, got $num/$den")

  private[graft] def prefixKeyed(elems: DataFrame, dfreq: DataFrame,
                          setKeys: Seq[String], tokCol: String,
                          num: Int, den: Int): DataFrame = {
    requireThreshold(num, den)
    val byRarity = Window.partitionBy(setKeys.map(col): _*)
      .orderBy(col("tok_df"), col(tokCol))
    val bySet = Window.partitionBy(setKeys.map(col): _*)
    // prefix length n − ⌈num·n/den⌉ + 1 in pure integer math:
    // ⌈num·n/den⌉ = (num·n + den − 1) div den — SQL `div` is true
    // integer division (Column `/` would be IEEE double division,
    // exact only while n·num stays inside 2^53)
    elems.join(dfreq, Seq(tokCol))
      .withColumn("pos", row_number().over(byRarity))
      .withColumn("n", count(lit(1)).over(bySet))
      .filter(col("pos") <=
        expr(s"n - ((n * $num + ${den - 1}) div $den) + 1"))
      .select((setKeys.map(col) :+ col(tokCol) :+ col("n")
        :+ col("pos")): _*)
  }

  /** Prefix index over distinct (id, token) rows: (id, token, n, pos)
    * for only each set's first n − ⌈t·n⌉ + 1 tokens under the global
    * ascending-DF order, where n is the set size, pos the token's
    * 1-based position in that order, and t = num/den.
    * Input MUST be distinct per (id, token) — n is a row count.
    */
  def prefixIndex(elems: DataFrame, idCol: String, tokCol: String,
                  num: Int, den: Int): DataFrame =
    prefixKeyed(elems,
      elems.groupBy(col(tokCol)).agg(count(lit(1)).as("tok_df")),
      Seq(idCol), tokCol, num, den)

  /** Positional bound (the "P" of PPJoin, Xiao et al. §3.2, adapted to
    * the grouped-join shape): for a candidate pair, `o` counts the
    * common tokens inside BOTH prefixes and (pa, pb) are the positions
    * of the LAST such match. Every other common token lies outside at
    * least one side's prefix, hence strictly after that side's last
    * match position — and since both sides list tokens in the one
    * global order, strictly after it on BOTH sides. So
    * c ≤ o + min(na − pa, nb − pb), and the threshold
    * c·(num+den) ≥ num·(na+nb) can be decided per band:
    * pairs with o already ≥ the required overlap are accepted without
    * verification (c ≥ o), pairs whose upper bound falls short are
    * rejected exactly, and only the band between needs the full
    * intersection count.
    */
  private[graft] def overlapBand(joined: DataFrame, num: Int, den: Int)
      : DataFrame =
    joined
      .groupBy(col("id_a"), col("id_b"), col("na"), col("nb"))
      .agg(count(lit(1)).as("o"),
        max(col("pa")).as("pa"), max(col("pb")).as("pb"))
      .withColumn("ubound", col("o") +
        least(col("na") - col("pa"), col("nb") - col("pb")))
      .filter(col("ubound") * (num + den) >= (col("na") + col("nb")) * num)
      .select(col("id_a"), col("id_b"), col("na"), col("nb"), col("o"))

  /** Candidate (id_a, id_b, na, nb, o) pairs: id pairs sharing a
    * prefix token, size-filtered (den·min ≥ num·max) and positional-
    * filtered (o + min-remaining can still reach the threshold — see
    * [[overlapBand]]). `o` is the count of shared prefix tokens; pairs
    * with o·(num+den) ≥ num·(na+nb) are PROVEN qualified already. A
    * superset of the true result by the prefix-filter lemma; never
    * all-pairs.
    */
  def candidatePairs(prefix: DataFrame, idCol: String, tokCol: String,
                     num: Int, den: Int): DataFrame = {
    requireThreshold(num, den)
    val a = prefix.select(col(tokCol), col(idCol).as("id_a"),
      col("n").as("na"), col("pos").as("pa"))
    val b = prefix.select(col(tokCol), col(idCol).as("id_b"),
      col("n").as("nb"), col("pos").as("pb"))
    overlapBand(
      a.join(b, Seq(tokCol))
        .filter(col("id_a") < col("id_b"))
        .filter(least(col("na"), col("nb")) * den >=
          greatest(col("na"), col("nb")) * num),
      num, den)
  }

  /** J ≥ num/den in overflow-free integer form over an overlap count. */
  private def qualifies(c: org.apache.spark.sql.Column, num: Int,
                        den: Int) =
    c * (num + den) >= (col("na") + col("nb")) * num

  /** The shared banding tail: accept candidates the prefix overlap
    * alone proves (c ≥ o), verify only the undecided band against the
    * exact intersection of full token arrays, union. `setsFor` builds
    * the (id_a, toks_a) / (id_b, toks_b) frames from the undecided
    * pairs — the ONLY part that differs between the self-join and
    * bipartite variants, so the threshold inequality lives in exactly
    * one place.
    *
    * SORT-FREE verification: both joins hint the sets side
    * shuffled-hash. The default sort-merge shape put rows CARRYING
    * token arrays through sort buffers — the pair frame re-sorted by
    * id_b while dragging toks_a along — and at 30× data (sf3,
    * local[32]) that sort spilled ~2 GB to disk (r11 ScaleBench flag)
    * even though the wall trend stayed sub-linear. Hash-building on
    * the sets side holds each candidate id's array exactly ONCE per
    * build map (the sets frames are id-distinct by construction),
    * streams the pair side, and sorts nothing, so array payloads
    * never enter a spillable sort at any SF.
    */
  private[graft] def resolveBands(cand: DataFrame, num: Int, den: Int)
      (setsFor: DataFrame => (DataFrame, DataFrame)): DataFrame = {
    val proven = qualifies(col("o"), num, den)
    val sure = cand.filter(proven).select(col("id_a"), col("id_b"))
    val maybe = cand.filter(!proven)
    val (setsA, setsB) = setsFor(maybe)
    val verified = maybe
      .join(setsA.hint("shuffle_hash"), Seq("id_a"))
      .join(setsB.hint("shuffle_hash"), Seq("id_b"))
      .withColumn("c", size(array_intersect(col("toks_a"), col("toks_b"))))
      .filter(qualifies(col("c"), num, den))
      .select(col("id_a"), col("id_b"))
    sure.unionByName(verified)
  }

  /** EXACT J ≥ num/den edge list (id_a < id_b) over distinct
    * (id, token) rows — identical to the naive all-elements self-join,
    * at prefix-bounded candidate cost. Default threshold ½.
    *
    * EAGER: the candidate-pair frame and the candidate-only token
    * arrays feed several downstream branches (the id union, both join
    * sides), and Spark re-executes a subtree per occurrence — so both
    * are materialized with an eager localCheckpoint (they are the
    * SMALL frames: threshold-surviving pairs and their members'
    * arrays, never the corpus). Blocks are freed by the ContextCleaner
    * once the result is unreferenced.
    */
  def jaccardEdges(elems: DataFrame, idCol: String, tokCol: String,
                   num: Int = 1, den: Int = 2): DataFrame = {
    // narrow immediately: wide callers' extra columns must not collide
    // with the internal tok_df/cand join names (the bipartite variant
    // always guarded this way); drop null tokens BEFORE the rekey —
    // string-space equi-joins already exclude them (null ≠ null drops
    // the row at the dfreq join, collect_list skips them at verify),
    // but xxhash64(null) is the non-null seed, so an unfiltered rekey
    // would turn never-matching tokens into one shared joinable value
    // and the injectivity audit could not see the divergence; then
    // re-key string tokens to audited 64-bit hashes ([[maybeHashed]] —
    // exact by proven injectivity, falls back to strings on the corpus
    // that would disprove it)
    val e = maybeHashed(
      elems.select(col(idCol), col(tokCol))
        .filter(col(tokCol).isNotNull),
      tokCol)
    edgesOver(e, idCol, tokCol, num, den)
  }

  /** [[jaccardEdges]] body over an ALREADY element-space-final token
    * frame — split out so the spec can run the string path directly
    * and pin hash-space ≡ string-space equality on real corpora. */
  private[graft] def edgesOver(e: DataFrame, idCol: String,
                               tokCol: String, num: Int, den: Int)
      : DataFrame = {
    val cand = candidatePairs(
      prefixIndex(e, idCol, tokCol, num, den),
      idCol, tokCol, num, den)
      .localCheckpoint(true)
    resolveBands(cand, num, den) { maybe =>
      // full token arrays ONLY for ids in some undecided pair
      val candIds = maybe.select(col("id_a").as("cand_id"))
        .unionByName(maybe.select(col("id_b").as("cand_id")))
        .distinct()
      val sets = e
        .join(candIds, col(idCol) === col("cand_id"), "left_semi")
        .groupBy(col(idCol))
        .agg(collect_list(col(tokCol)).as("toks"))
        .localCheckpoint(true)
      (sets.select(col(idCol).as("id_a"), col("toks").as("toks_a")),
        sets.select(col(idCol).as("id_b"), col("toks").as("toks_b")))
    }
  }

  /** Bipartite variant: EXACT J ≥ num/den pairs ACROSS two frames of
    * distinct (id, token) rows — every (id_a ∈ left, id_b ∈ right) with
    * Jaccard(left set, right set) ≥ threshold, identical to the naive
    * cross-frame join at prefix-bounded cost. The lemma is unchanged:
    * it only needs both sides' prefixes drawn from the SAME total token
    * order, so the DF order is computed once over the UNION corpus and
    * applied to each side. This is the train/eval decontamination
    * shape: `left` = eval shingles, `right` = train shingles; a hot
    * boilerplate shingle still never enters a prefix, so no eval↔train
    * key pair fans out quadratically.
    *
    * Ids need not be unique across frames (sets are keyed by
    * side + id internally); the same id on both sides is two sets.
    */
  def jaccardEdgesBipartite(left: DataFrame, right: DataFrame,
                            idCol: String, tokCol: String,
                            num: Int = 1, den: Int = 2): DataFrame =
    bipartiteOver(
      left.select(col(idCol), col(tokCol)).withColumn("_side", lit(0))
        .unionByName(right.select(col(idCol), col(tokCol))
          .withColumn("_side", lit(1))),
      idCol, tokCol, num, den)

  /** [[jaccardEdgesBipartite]] for sides that are PARTITIONS OF ONE
    * FRAME (r20, guide §1.2 step 1): `sideCol` is a boolean column on
    * `elems` — true rows are the RIGHT side (id_b; e.g. the train
    * split), false rows the LEFT (id_a; eval). Semantically identical
    * to splitting the frame and calling the two-frame face (a spec
    * pins it on both threshold shapes), but the physical plan never
    * UNIONS two filtered copies of the same input: the two-frame
    * face's `both` is a Union whose children each re-execute the
    * shared upstream (for d36 that is the shingle-cache scan, the
    * split join, and the hash rekey), so every full-frame consumer —
    * the DF-order aggregation, the injectivity audit, the candidate
    * fetch — paid the upstream TWICE. Here `both` is one subtree and
    * each of those consumers pays it once; only the per-side prefix
    * branches of the candidate join still scan it twice, which the
    * two-frame face also did (its union children prune per branch).
    * Rows with a NULL side are excluded — exactly the rows the
    * two-frame face's boolean filters drop.
    */
  def jaccardEdgesBipartiteTagged(elems: DataFrame, idCol: String,
                                  tokCol: String, sideCol: String,
                                  num: Int = 1, den: Int = 2): DataFrame =
    bipartiteOver(
      elems.filter(col(sideCol).isNotNull)
        .select(col(idCol), col(tokCol),
          when(col(sideCol), lit(1)).otherwise(lit(0)).as("_side")),
      idCol, tokCol, num, den)

  // shared bipartite body over a side-tagged (_side ∈ {0 left, 1
  // right}) token frame
  private def bipartiteOver(tagged: DataFrame, idCol: String,
                            tokCol: String, num: Int, den: Int)
      : DataFrame = {
    // same null-token exclusion as [[jaccardEdges]], applied before the
    // union-vocabulary audit so hash space and string space agree on
    // corpora containing null tokens
    val e0 = tagged.filter(col(tokCol).isNotNull)
    // audited hash re-key over the UNION vocabulary — both sides must
    // land in the same element space for the shared DF order and the
    // cross-frame intersection counts to mean anything
    val hash = e0.schema(tokCol).dataType ==
        org.apache.spark.sql.types.StringType &&
      injectiveMemo(e0.select(col(idCol), col(tokCol)), tokCol)
    val both =
      if (hash) e0.withColumn(tokCol, xxhash64(col(tokCol))) else e0
    val dfreq = both.groupBy(col(tokCol)).agg(count(lit(1)).as("tok_df"))
    val prefix = prefixKeyed(both, dfreq, Seq("_side", idCol), tokCol,
      num, den)
    val cand = overlapBand(
      prefix.filter(col("_side") === 0)
        .select(col(tokCol), col(idCol).as("id_a"),
          col("n").as("na"), col("pos").as("pa"))
        .join(prefix.filter(col("_side") === 1)
          .select(col(tokCol), col(idCol).as("id_b"),
            col("n").as("nb"), col("pos").as("pb")),
          Seq(tokCol))
        .filter(least(col("na"), col("nb")) * den >=
          greatest(col("na"), col("nb")) * num),
      num, den)
      .localCheckpoint(true)
    resolveBands(cand, num, den) { maybe =>
      // ONE sets pass for BOTH sides (r20, guide §1.2 step 1): the
      // r19 shape ran a per-side fetch — two semi-joins, two
      // collect_list aggregations, two eager checkpoints — each
      // re-executing its side's token-frame construction (the
      // split-tag join and the hash rekey). The self-join variant
      // (jaccardEdges) always built ONE candidate-pruned sets frame;
      // this brings the bipartite variant in line: one semi-join on
      // (side, id), one aggregation, one checkpoint, and the two join
      // inputs are filtered VIEWS of the pinned frame (a checkpoint
      // scan, not a recomputation). Verification semantics unchanged —
      // same rows reach collect_list, array_intersect is order-
      // insensitive. Measured at sf0.1: d36's candidate id set covers
      // ~90% of the corpus (962/1000 eval, 3424/4000 train ids), so
      // the fetch IS a corpus-scale pass and halving its executions is
      // the verify term's real lever (the o-histogram shows the
      // ordered pre-verify filter has nothing sound to cut —
      // OPTIMIZATION_r20.md §3).
      val candIds = maybe
        .select(lit(0).as("_cside"), col("id_a").as("_cid"))
        .unionByName(maybe
          .select(lit(1).as("_cside"), col("id_b").as("_cid")))
        .distinct()
      val sets = both
        .join(candIds, col("_side") === col("_cside") &&
          col(idCol) === col("_cid"), "left_semi")
        .groupBy(col("_side"), col(idCol))
        .agg(collect_list(col(tokCol)).as("toks"))
        .localCheckpoint(true)
      (sets.filter(col("_side") === 0)
        .select(col(idCol).as("id_a"), col("toks").as("toks_a")),
        sets.filter(col("_side") === 1)
          .select(col(idCol).as("id_b"), col("toks").as("toks_b")))
    }
  }
}
