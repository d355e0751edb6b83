package graft

import graft.operators.{Dedup, PpJoin}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Stage-level timing and variant comparison for the d24 PPJoin dedup
  * anchor (ad-hoc scale diagnostics, [[Diag]] family — not part of the
  * driver contract). VERDICT r11 Next #1 names d24 the 100× wall floor
  * (190.7 s at sf10, cpu_s 4132 on linear bytes) and asks for two
  * variants measured at sf3/sf10 against the shipped shape:
  *
  *  1. '''hash-space execution''' — the r12 [[PpJoin]] change: tokens
  *     re-keyed to audited-injective 64-bit hashes, so the rarity sort,
  *     prefix join, and band intersection all run on longs. Compared
  *     here against the string-space path (`edgesOver` on the raw
  *     frame) on identical inputs.
  *  2. '''dedup-first''' — collapse documents with IDENTICAL shingle
  *     sets to one representative before the pairwise join, star the
  *     members to their representative afterwards (components are
  *     preserved: same-set members are pairwise J=1, and a cross-group
  *     edge holds for all members iff it holds for representatives).
  *     Worth exactly the identical-set mass, which this diag measures
  *     first — on the affine-copy corpora every text is distinct by
  *     construction, so the expected result is a recorded negative.
  *
  * Usage: runMain graft.PpDiag <sfDir> [variant ...]
  *   variants: stages audit hash strings dedupfirst d36
  *   (default: all but d36)
  *
  * `d36` (r20, VERDICT r19 Next #3): stage-level decomposition of the
  * BIPARTITE path exactly as d36_decontam_exact_pairs runs it — the
  * union-corpus DF order, the per-side prefix windows, the cross-side
  * candidate join, and the verification band — with the candidate
  * counts (sure / undecided / verified) that decide whether a
  * pre-verify filter has anything to cut.
  */
object PpDiag {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("target/scale/sf3")
    val variants =
      if (args.length > 1) args.drop(1).toSet
      else Set("stages", "audit", "hash", "strings", "dedupfirst")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def timed[A](label: String)(body: => A): A = {
      val t0 = System.nanoTime()
      val r = body
      println(f"stage $label%-16s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }

    // spill attribution: name every stage that spills (the sf10 hash
    // run's 490 MB had no owner until this listener)
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onStageCompleted(
            s: org.apache.spark.scheduler.SparkListenerStageCompleted)
            : Unit = {
          val m = s.stageInfo.taskMetrics
          if (m.diskBytesSpilled > 0)
            println(f"  SPILL ${m.diskBytesSpilled / 1e6}%.0f MB in stage " +
              s"${s.stageInfo.stageId}: ${s.stageInfo.name}")
        }
      })

    val docs = Tables.load(spark, dir, "documents")
    val sh = docs.select(col("doc_id"),
        explode(array_distinct(
          graft.functions.TextFunctions.wordShingles(col("text"), 3)))
          .as("g"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    timed("shingles")(println(s"  rows=${sh.count()}"))

    if (variants("stages")) {
      // order-independent set digest: one xxhash64 over the SORTED
      // distinct element hashes — canonical order makes it
      // order-independent without XOR's cancellation class (any
      // symmetric difference whose hashes XOR to 0 would merge two
      // genuinely different sets). The identical-set mass bounds what
      // dedup-first can ever save
      val setGroups = sh.groupBy(col("doc_id"))
        .agg(expr("xxhash64(array_sort(collect_set(xxhash64(g))))").as("_sd"))
      val nDocs = setGroups.count()
      val nSets = timed("set_digests")(
        setGroups.select(col("_sd")).distinct().count())
      println(s"  docs=$nDocs distinct_sets=$nSets " +
        f"collapse=${100.0 * (nDocs - nSets) / nDocs}%.2f%%")
    }

    def survivors(edges: DataFrame): Long =
      Dedup.nearDupSurvivors(docs, "doc_id", edges)
        .filter(col("is_survivor")).count()

    if (variants("audit")) {
      // isolates the injectivity audit (the one string-keyed pass hash
      // mode retains) from the join itself — spill attribution
      timed("audit_pass")(
        println(s"  injective=${PpJoin.hashInjective(sh, "g")}"))
      timed("hash_distinct")(
        println(s"  nHash=${sh.select(xxhash64(col("g"))).distinct().count()}"))
    }
    if (variants("hash")) timed("hash_space") {
      println(s"  survivors=${survivors(
        PpJoin.jaccardEdges(sh, "doc_id", "g"))}")
    }
    if (variants("strings")) timed("string_space") {
      println(s"  survivors=${survivors(
        PpJoin.edgesOver(sh, "doc_id", "g", 1, 2))}")
    }
    if (variants("d36")) {
      // the d36 query body, staged: the shingle frame is rebuilt with
      // the query's OWN builder (WordShingles — the d24sh FrameCache
      // recipe) and persisted like the cache pins it; the split is the
      // d15 content-hash bucket, threshold 1/2
      val (num, den) = (1, 2)
      val sh36 = docs.select(col("doc_id"),
          explode(array_distinct(graft.functions.WordShingles
            .wordShingles(col("text"), 3))).as("g"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      timed("d36_shingles")(println(s"  rows=${sh36.count()}"))
      val split = docs.select(col("doc_id"),
        (graft.functions.SamplingFunctions.hashBucket(col("text")) < 80)
          .as("is_train"))
      val tagged = sh36.join(split, Seq("doc_id"))
      val l0 = tagged.filter(!col("is_train"))
        .select(col("doc_id"), col("g")).filter(col("g").isNotNull)
      val r0 = tagged.filter(col("is_train"))
        .select(col("doc_id"), col("g")).filter(col("g").isNotNull)
      val inj = timed("d36_audit")(
        PpJoin.hashInjective(l0.unionByName(r0), "g"))
      println(s"  injective=$inj")
      def rekey(df: DataFrame): DataFrame =
        if (inj) df.withColumn("g", xxhash64(col("g"))) else df
      val l = rekey(l0)
      val r = rekey(r0)
      val both = l.withColumn("_side", lit(0))
        .unionByName(r.withColumn("_side", lit(1)))
      val dfreq = both.groupBy(col("g")).agg(count(lit(1)).as("tok_df"))
      timed("d36_dfreq")(println(s"  distinct_tokens=${dfreq.count()}"))
      val prefix = PpJoin.prefixKeyed(both, dfreq, Seq("_side", "doc_id"),
        "g", num, den)
      timed("d36_prefix") {
        prefix.write.mode("overwrite").format("noop").save()
      }
      val cand = timed("d36_cand") {
        PpJoin.overlapBand(
          prefix.filter(col("_side") === 0)
            .select(col("g"), col("doc_id").as("id_a"),
              col("n").as("na"), col("pos").as("pa"))
            .join(prefix.filter(col("_side") === 1)
              .select(col("g"), col("doc_id").as("id_b"),
                col("n").as("nb"), col("pos").as("pb")),
              Seq("g"))
            .filter(least(col("na"), col("nb")) * den >=
              greatest(col("na"), col("nb")) * num),
          num, den)
          .localCheckpoint(true)
      }
      val nCand = cand.count()
      val nSure = cand.filter(col("o") * (num + den) >=
        (col("na") + col("nb")) * num).count()
      println(s"  candidates=$nCand proven=$nSure undecided=${
        nCand - nSure}")
      // o histogram: how much prefix-overlap evidence the undecided
      // band carries — o = 1 means the pair met on ONE shared prefix
      // token, where the size and positional filters are already
      // information-theoretically saturated at t = 1/2
      cand.groupBy(col("o")).agg(count(lit(1)).as("n"))
        .orderBy(col("o")).collect()
        .foreach(r => println(s"  o=${r.getLong(0)} pairs=${r.getLong(1)}"))
      // distinct ids entering the verify fetch (the array-build cost
      // driver): how close to "the whole corpus" the candidate id set is
      println(s"  cand_ids_a=${cand.select(col("id_a")).distinct().count()}" +
        s" cand_ids_b=${cand.select(col("id_b")).distinct().count()}")
      // NOTE: this staged verify keeps the r19 TWO-PASS per-side sets
      // fetch deliberately — it is the before-comparator for the r20
      // single-pass shape the shipped jaccardEdgesBipartite now uses
      // (timed below as d36_full, which calls the real operator)
      timed("d36_verify") {
        PpJoin.resolveBands(cand, num, den) { maybe =>
          def sideSets(side: DataFrame, asId: String, asToks: String) =
            side.join(maybe.select(col(asId).as("_cid")).distinct(),
                col("doc_id") === col("_cid"), "left_semi")
              .groupBy(col("doc_id"))
              .agg(collect_list(col("g")).as(asToks))
              .select(col("doc_id").as(asId), col(asToks))
              .localCheckpoint(true)
          (sideSets(l, "id_a", "toks_a"), sideSets(r, "id_b", "toks_b"))
        }.write.mode("overwrite").format("noop").save()
      }
      timed("d36_full") {
        PpJoin.jaccardEdgesBipartite(
          tagged.filter(!col("is_train")).select(col("doc_id"), col("g")),
          tagged.filter(col("is_train")).select(col("doc_id"), col("g")),
          "doc_id", "g")
          .write.mode("overwrite").format("noop").save()
      }
    }

    if (variants("dedupfirst")) timed("dedup_first") {
      val sd = sh.groupBy(col("doc_id"))
        .agg(expr("xxhash64(array_sort(collect_set(xxhash64(g))))").as("_sd"))
      val rep = sd.groupBy(col("_sd")).agg(min(col("doc_id")).as("_rep"))
      val withRep = sd.join(rep, Seq("_sd"))
        .select(col("doc_id"), col("_rep"))
        .localCheckpoint(true)
      val repSh = sh.join(
        withRep.filter(col("doc_id") === col("_rep")).select("doc_id"),
        Seq("doc_id"), "left_semi")
      val repEdges = PpJoin.jaccardEdges(repSh, "doc_id", "g")
      val starEdges = withRep.filter(col("doc_id") =!= col("_rep"))
        .select(col("doc_id").as("id_a"), col("_rep").as("id_b"))
      println(s"  survivors=${survivors(
        repEdges.unionByName(starEdges))}")
    }
    spark.stop()
  }
}
