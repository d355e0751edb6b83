package graft.queries

import graft.{QueryPack, Tables}
import graft.operators.EdJoin
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Behavioral-analytics and fuzzy-matching shapes the earlier packs don't
  * cover: sequence-respecting funnels, cohort retention, interval
  * sweep-line concurrency, gaps-and-islands streaks, and edit-distance
  * nearest neighbors. All five are DuckDB-oracle-checked.
  *
  * Time discipline: every day/offset derivation goes through integer
  * division on epoch MICROS (`unix_micros(ts) div 86_400_000_000`), never
  * `to_date`/`date_trunc` — day indexing stays timezone-free and
  * engine-exact on both sides (the same idiom as `Tables.load`'s nanos
  * truncation).
  */
object Analytics extends QueryPack {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  private val DayUs = 86400000000L

  /** Session bounds per user — the e02 sessionization (30-min inactivity
    * gap) reduced to [start, end] epoch-micros intervals. Shared by e13.
    */
  private def sessionBounds(s: SparkSession, dir: String): DataFrame = {
    val byUser = Window.partitionBy(col("user_id")).orderBy(col("ts"))
    val gapMicros = 30L * 60 * 1000000
    t(s, dir, "events")
      .withColumn("prev_ts", lag(col("ts"), 1).over(byUser))
      .withColumn("new_session",
        when(col("prev_ts").isNull, 1)
          .when(unix_micros(col("ts")) - unix_micros(col("prev_ts"))
            > gapMicros, 1)
          .otherwise(0))
      .withColumn("session_id",
        sum(col("new_session")).over(
          byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("user_id"), col("session_id"))
      .agg(min(unix_micros(col("ts"))).as("ss"),
        max(unix_micros(col("ts"))).as("se"))
  }

  def queries: Map[String, QueryFn] = Map(
    // SEQUENCE-respecting funnel: e04 is first-touch (first view vs
    // first click vs first purchase, regardless of order); this is the
    // stricter stepwise definition — the first click AFTER the first
    // view, then the first purchase AFTER that click. Three chained
    // window minima over ONE user partitioning (each refers to the
    // previous one as a per-row constant), so the whole funnel costs a
    // single shuffle and no self-join.
    "e11_stepwise_funnel" -> { (s, dir) =>
      val wU = Window.partitionBy(col("user_id"))
      t(s, dir, "events")
        .withColumn("first_view",
          min(when(col("event_type") === "view", col("ts"))).over(wU))
        .withColumn("seq_click",
          min(when(col("event_type") === "click" &&
            col("ts") > col("first_view"), col("ts"))).over(wU))
        .withColumn("seq_purchase",
          min(when(col("event_type") === "purchase" &&
            col("ts") > col("seq_click"), col("ts"))).over(wU))
        .groupBy(col("user_id"))
        .agg(min(col("first_view")).as("first_view"),
          min(col("seq_click")).as("seq_click"),
          min(col("seq_purchase")).as("seq_purchase"))
        .withColumn("funnel_complete", col("seq_purchase").isNotNull)
    },
    // Cohort retention: users grouped by first-active day, counted
    // distinct on each later active day. One window min for the cohort
    // day (reusing the user partitioning) + one distinct aggregate;
    // output is O(days²) regardless of corpus size.
    "e12_retention_cohorts" -> { (s, dir) =>
      val wU = Window.partitionBy(col("user_id"))
      t(s, dir, "events")
        .select(col("user_id"),
          expr(s"unix_micros(ts) div $DayUs").as("d"))
        .withColumn("cohort_day", min(col("d")).over(wU))
        .groupBy(col("cohort_day"),
          (col("d") - col("cohort_day")).as("day_offset"))
        .agg(countDistinct(col("user_id")).as("n_users"))
    },
    // Peak concurrent sessions per day — the interval sweep-line: e02
    // sessions become half-open occupancy intervals [ss, se+1µs) (so a
    // single-event session still occupies its microsecond), clipped to
    // day boundaries so the sweep partitions by day instead of needing
    // a global sort; +1/-1 deltas, running sum ordered by (t, delta)
    // with ends before starts (half-open: a session ending exactly when
    // another starts does not overlap it), max per day. Tie groups share
    // one delta sign, so the prefix-sum multiset — and the max — is
    // order-independent. At 100 TB the per-day sweep would go
    // hierarchical (hour-bucket partial sums + prefix over buckets,
    // BucketedRank's two-level kernel); day partitioning is the honest
    // single-level version of that plan.
    "e13_max_concurrency" -> { (s, dir) =>
      sessionBounds(s, dir)
        .withColumn("day_idx",
          explode(sequence(expr(s"ss div $DayUs"), expr(s"se div $DayUs"))))
        .withColumn("cs", greatest(col("ss"), col("day_idx") * DayUs))
        .withColumn("ce",
          least(col("se") + 1, (col("day_idx") + 1) * DayUs))
        .select(col("day_idx"), explode(array(
          struct(col("cs").as("t"), lit(1).as("delta")),
          struct(col("ce").as("t"), lit(-1).as("delta")))).as("ev"))
        .select(col("day_idx"), col("ev.t").as("t"),
          col("ev.delta").as("delta"))
        .withColumn("conc", sum(col("delta")).over(
          Window.partitionBy(col("day_idx")).orderBy(col("t"), col("delta"))
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .groupBy(col("day_idx"))
        .agg(max(col("conc")).as("max_concurrent"))
    },
    // Gaps-and-islands: longest run of consecutive active months per
    // customer. The island key is monthIndex − row_number — constant
    // within a consecutive run, distinct across gaps — so streaks fall
    // out of one window + two partial aggregations, no self-join.
    "w08_order_streaks" -> { (s, dir) =>
      val wC = Window.partitionBy(col("o_custkey")).orderBy(col("mi"))
      t(s, dir, "orders")
        .select(col("o_custkey"),
          expr("CAST(year(o_orderdate)*12 + month(o_orderdate) AS BIGINT)")
            .as("mi"))
        .distinct()
        .withColumn("grp", col("mi") - row_number().over(wC))
        .groupBy(col("o_custkey"), col("grp"))
        .agg(count(lit(1)).as("len"))
        .groupBy(col("o_custkey"))
        .agg(max(col("len")).as("max_streak"),
          count(lit(1)).as("n_streaks"),
          sum(col("len")).as("n_active_months"))
    },
    // Edit-distance nearest neighbor over 120-char heads — the dedup
    // modality d01-d09 lack (exact/MinHash/SimHash/Jaccard all token-
    // based; this is character-level). Blocking: (lang, source) plus a
    // length band — bucket width 16 > the 12-char length gate, and both
    // sides emit {base, base+1}, so every qualifying pair shares ≥1 key;
    // keeping only the match on max(a_base, b_base) dedupes the double
    // hit without a distinct. Candidates stay linear in block sizes —
    // never all-pairs. At real scale a popular (lang, source) block
    // needs a second key (a SimHash band, d07's path); the length band
    // is the exact-result version. min(struct(dist, id)) makes the
    // neighbor choice deterministic under ties.
    "d40_edit_nn" -> { (s, dir) =>
      val h = t(s, dir, "documents")
        .select(col("doc_id"), col("lang"), col("source"),
          substring(col("text"), 1, 120).as("head"))
        .withColumn("hl", length(col("head")))
        .withColumn("base", expr("CAST(hl div 16 AS INT)"))
        .withColumn("bkt", explode(array(col("base"), col("base") + 1)))
      // The probe side's cost is CPU (a 120×120 edit-distance DP per
      // candidate pair), not bytes: a small input can arrive as ONE
      // split and serialize the whole verification onto one core, and
      // AQE coalesces shuffles by byte size so it would undo a plain
      // repartition. An explicit-width repartition (which AQE leaves
      // alone) spreads the DP work across every core; the build side
      // stays broadcast, so this adds no join shuffle.
      val a = h.select(col("doc_id").as("a_id"), col("lang"),
        col("source"), col("bkt"), col("head").as("a_head"),
        col("hl").as("a_hl"), col("base").as("a_base"))
        .repartition(s.sparkContext.defaultParallelism, col("a_id"))
      val b = h.select(col("doc_id").as("b_id"), col("lang").as("b_lang"),
        col("source").as("b_source"), col("bkt").as("b_bkt"),
        col("head").as("b_head"), col("hl").as("b_hl"),
        col("base").as("b_base"))
      a.join(b,
        col("lang") === col("b_lang") && col("source") === col("b_source")
          && col("bkt") === col("b_bkt")
          && col("a_id") =!= col("b_id")
          && abs(col("a_hl") - col("b_hl")) <= 12
          && col("bkt") === greatest(col("a_base"), col("b_base")))
        .select(col("a_id").as("doc_id"), col("b_id").as("nn"),
          levenshtein(col("a_head"), col("b_head")).as("d"))
        .groupBy(col("doc_id"))
        .agg(min(struct(col("d"), col("nn"))).as("best"))
        .select(col("doc_id"), col("best.nn").as("nn_id"),
          col("best.d").as("nn_dist"))
    },
    // Exact bounded edit-distance self-join via EdJoin's q-gram prefix
    // filter (d40 is blocked nearest-neighbor; this is the full pair
    // set, and c_name is the adversarial corpus for it — every string
    // shares the "Customer#…" prefix, so positional blocking degrades
    // to one block while the DF-rarity prefix order prunes exactly).
    "d41_edit_pairs" -> { (s, dir) =>
      EdJoin.editPairs(t(s, dir, "customer"), "c_custkey", "c_name", k = 1)
        .select(col("id_a").as("a_key"), col("id_b").as("b_key"),
          col("dist"))
    },
    // ORACLE ANCHOR for character-level dedup: the d24 treatment
    // (connected components → min-id survivor, hash-checked against a
    // DuckDB recursive-CTE closure) over an exact edit-distance ≤ 2
    // edge list on 120-char document heads. d24/d11 cluster on token
    // sets; this is the modality that catches near-dups token methods
    // miss (single-character edits inside words). EdJoin's q-gram
    // prefix filter keeps the edge list candidate-bounded — never
    // all-pairs — and [[graft.operators.Dedup.connectedComponents]]
    // contracts the sparse graph in O(log² n) rounds.
    "d42_edit_dedup_survivors" -> { (s, dir) =>
      val docs = t(s, dir, "documents")
      val heads = docs.select(col("doc_id"),
        substring(col("text"), 1, 120).as("head"))
      val edges = EdJoin.editPairs(heads, "doc_id", "head", k = 2)
        .select(col("id_a"), col("id_b"))
      graft.operators.Dedup.nearDupSurvivors(docs, "doc_id", edges)
        .select(col("id"), col("component"), col("is_survivor"))
    },
  )

  def oracleSql: Map[String, String] = Map(
    "e11_stepwise_funnel" ->
      """WITH w1 AS (
           SELECT user_id, event_type, CAST(ts AS TIMESTAMP) AS ts,
                  min(CASE WHEN event_type = 'view'
                      THEN CAST(ts AS TIMESTAMP) END)
                    OVER (PARTITION BY user_id) AS first_view
           FROM events
         ), w2 AS (
           SELECT *, min(CASE WHEN event_type = 'click' AND ts > first_view
                         THEN ts END)
                       OVER (PARTITION BY user_id) AS seq_click
           FROM w1
         ), w3 AS (
           SELECT *, min(CASE WHEN event_type = 'purchase'
                              AND ts > seq_click THEN ts END)
                       OVER (PARTITION BY user_id) AS seq_purchase
           FROM w2
         )
         SELECT user_id, min(first_view) AS first_view,
                min(seq_click) AS seq_click,
                min(seq_purchase) AS seq_purchase,
                min(seq_purchase) IS NOT NULL AS funnel_complete
         FROM w3 GROUP BY user_id""",
    "e12_retention_cohorts" ->
      """WITH days AS (
           SELECT user_id,
                  epoch_us(CAST(ts AS TIMESTAMP)) // 86400000000 AS d
           FROM events
         ), cohorts AS (
           SELECT user_id, d,
                  min(d) OVER (PARTITION BY user_id) AS cohort_day
           FROM days
         )
         SELECT cohort_day, d - cohort_day AS day_offset,
                count(DISTINCT user_id) AS n_users
         FROM cohorts GROUP BY 1, 2""",
    "e13_max_concurrency" ->
      """WITH flagged AS (
           SELECT user_id, CAST(ts AS TIMESTAMP) AS ts,
                  CASE WHEN lag(ts) OVER w IS NULL THEN 1
                       WHEN epoch_us(CAST(ts AS TIMESTAMP))
                            - epoch_us(CAST(lag(ts) OVER w AS TIMESTAMP))
                            > 1800000000 THEN 1
                       ELSE 0 END AS new_session
           FROM events
           WINDOW w AS (PARTITION BY user_id ORDER BY ts)
         ), numbered AS (
           SELECT user_id, ts,
                  sum(new_session) OVER (PARTITION BY user_id ORDER BY ts
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                    AS session_id
           FROM flagged
         ), sess AS (
           SELECT user_id, session_id,
                  min(epoch_us(ts)) AS ss, max(epoch_us(ts)) AS se
           FROM numbered GROUP BY 1, 2
         ), spans AS (
           SELECT ss, se, unnest(generate_series(
                    ss // 86400000000, se // 86400000000)) AS day_idx
           FROM sess
         ), clipped AS (
           SELECT day_idx,
                  greatest(ss, day_idx * 86400000000) AS cs,
                  least(se + 1, (day_idx + 1) * 86400000000) AS ce
           FROM spans
         ), deltas AS (
           SELECT day_idx, cs AS t, 1 AS delta FROM clipped
           UNION ALL
           SELECT day_idx, ce AS t, -1 AS delta FROM clipped
         ), swept AS (
           SELECT day_idx,
                  CAST(sum(delta) OVER (PARTITION BY day_idx
                    ORDER BY t, delta
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                    AS BIGINT) AS conc
           FROM deltas
         )
         SELECT day_idx, max(conc) AS max_concurrent
         FROM swept GROUP BY day_idx""",
    "w08_order_streaks" ->
      """WITH months AS (
           SELECT DISTINCT o_custkey,
                  CAST(year(o_orderdate)*12 + month(o_orderdate) AS BIGINT)
                    AS mi
           FROM orders
         ), islands AS (
           SELECT o_custkey,
                  mi - row_number() OVER (PARTITION BY o_custkey
                    ORDER BY mi) AS grp
           FROM months
         ), streaks AS (
           SELECT o_custkey, grp, count(1) AS len
           FROM islands GROUP BY 1, 2
         )
         SELECT o_custkey, max(len) AS max_streak,
                count(1) AS n_streaks,
                CAST(sum(len) AS BIGINT) AS n_active_months
         FROM streaks GROUP BY o_custkey""",
    "d40_edit_nn" ->
      """WITH h AS (
           SELECT doc_id, lang, source, substr(text, 1, 120) AS head,
                  length(substr(text, 1, 120)) AS hl
           FROM documents
         ), pairs AS (
           SELECT a.doc_id AS doc_id, b.doc_id AS nn_id,
                  levenshtein(a.head, b.head) AS nn_dist
           FROM h a JOIN h b
             ON a.lang = b.lang AND a.source = b.source
             AND a.doc_id <> b.doc_id AND abs(a.hl - b.hl) <= 12
         ), ranked AS (
           SELECT *, row_number() OVER (PARTITION BY doc_id
                       ORDER BY nn_dist, nn_id) AS rn
           FROM pairs
         )
         SELECT doc_id, nn_id, CAST(nn_dist AS INT) AS nn_dist
         FROM ranked WHERE rn = 1""",
    "d41_edit_pairs" ->
      """SELECT a.c_custkey AS a_key, b.c_custkey AS b_key,
                CAST(levenshtein(a.c_name, b.c_name) AS INT) AS dist
         FROM customer a JOIN customer b
           ON a.c_custkey < b.c_custkey
         WHERE levenshtein(a.c_name, b.c_name) <= 1""",
    "d42_edit_dedup_survivors" ->
      """WITH RECURSIVE h AS (
           SELECT doc_id, substr(text, 1, 120) AS head FROM documents
         ), edges AS (
           SELECT a.doc_id AS id_a, b.doc_id AS id_b
           FROM h a JOIN h b
             ON a.doc_id < b.doc_id
            AND levenshtein(a.head, b.head) <= 2
         ), sym AS (
           SELECT id_a AS a, id_b AS b FROM edges
           UNION SELECT id_b, id_a FROM edges
         ), reach(a, b) AS (
           SELECT a, a FROM sym
           UNION
           SELECT r.a, e.b FROM reach r JOIN sym e ON r.b = e.a
         ), comp AS (
           SELECT a AS id, min(b) AS component FROM reach GROUP BY a
         )
         SELECT d.doc_id AS id,
                coalesce(c.component, d.doc_id) AS component,
                d.doc_id = coalesce(c.component, d.doc_id) AS is_survivor
         FROM documents d LEFT JOIN comp c ON c.id = d.doc_id""",
  )
}
