package graft

import graft.operators.CdcDedup
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Ad-hoc stage attribution for the d50/d51 sf3 wall blow-ups found by
  * the r11 third-decade sweep ([[Diag]] family — not driver contract).
  * Materializes each phase of the suspect query separately and prints
  * the ADAPTIVE final plan of the slow composite, so the 38× wall at
  * 3× data can be attributed to a stage instead of argued.
  */
object FamDiag {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("target/scale/sf1")
    val which = if (args.length > 1) args(1) else "d50"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val shufW = new java.util.concurrent.atomic.AtomicLong
    val shufR = new java.util.concurrent.atomic.AtomicLong
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onStageCompleted(
            s: org.apache.spark.scheduler.SparkListenerStageCompleted)
            : Unit = {
          shufW.addAndGet(
            s.stageInfo.taskMetrics.shuffleWriteMetrics.bytesWritten)
          shufR.addAndGet(
            s.stageInfo.taskMetrics.shuffleReadMetrics.totalBytesRead)
        }
      })
    def timed[A](label: String)(body: => A): A = {
      val t0 = System.nanoTime()
      val w0 = shufW.get; val r0 = shufR.get
      val r = body
      Thread.sleep(400) // listener drain
      println(f"phase $label%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s" +
        f"  w=${(shufW.get - w0) / 1e6}%9.1f MB r=${
          (shufR.get - r0) / 1e6}%9.1f MB")
      r
    }
    def noop(df: DataFrame): Unit =
      df.write.mode("overwrite").format("noop").save()

    val docs = Tables.load(spark, dir, "documents")

    which match {
      case "d50" =>
        val arrivals = docs.filter(col("source") === "src0")
        val reference = docs.filter(col("source") =!= "src0")
        timed("segments(arrivals)")(noop(
          CdcDedup.segments(arrivals, "doc_id", "text", 16)))
        timed("segments(reference)")(noop(
          CdcDedup.segments(reference, "doc_id", "text", 16)))
        val index = CdcDedup.segmentIndex(reference, "doc_id", "text", 16)
        timed("index distinct")(noop(index))
        val full = CdcDedup.scrubSegments(arrivals, "doc_id", "text",
          index, 16)
        timed("full scrub")(noop(full))
        println(full.queryExecution.executedPlan.toString.take(12000))
      case "mass" =>
        // ground truth for the d44/d46 byte-scaling question: how does
        // the corpus's REPEATED-gram mass (the pass-2 shuffle driver)
        // actually scale? (occurrence-counted, hash-level — exactly
        // what repeatedHashPositions keeps)
        val g = docs.filter(length(col("text")) >= 40)
          .select(col("doc_id").as("_id"),
            explode(transform(
              sequence(lit(1), length(col("text")) - 39),
              p => xxhash64(col("text").substr(p, lit(40))))).as("_gh"))
        val dup = g.groupBy(col("_gh")).agg(count(lit(1)).as("c"))
          .filter(col("c") > 1)
        val total = timed("total positions")(g.count())
        val stats = timed("dup hash stats")(
          dup.agg(count(lit(1)), sum(col("c")), max(col("c"))).head())
        println(s"total=$total dupHashes=${stats.getLong(0)} " +
          s"dupMass=${stats.getLong(1)} maxOcc=${stats.getLong(2)}")
      case "d47parts" =>
        // phase split of the bipartite gram scrub — attributing the
        // sf30 3.78× byte step (r12 sweep watch item): index build
        // (the one gram-string-keyed aggregate) vs probe vs verify
        import graft.operators.SubstrDedup
        val arrivals = docs.filter(col("source") === "src0")
        val reference = docs.filter(col("source") =!= "src0")
        val idx = timed("scrub_index") {
          // DISK_ONLY: at sf30 the 326M-row index (~10+ GB) pinned in
          // heap starves the probe stages into OOM (measured); disk
          // blocks keep the phase isolation without the residency
          val i = SubstrDedup.scrubIndex(reference, "doc_id", "text", 59)
            .persist(org.apache.spark.storage.StorageLevel.DISK_ONLY)
          println(s"  index_rows=${i.count()}")
          i
        }
        timed("probe+verify")(noop(SubstrDedup.coveredByCorpus(
          arrivals, "doc_id", "text", idx, reference, 59)))
        timed("full d47")(noop(SubstrDedup.scrubAgainstCorpus(
          arrivals, reference, "doc_id", "text", 59)))
      case "d42cc" =>
        // freeze telemetry for the closed-star CC (r13): runs d42's
        // exact edge build, then connectedComponents with the
        // onRound/onFreeze observers, printing per-round frozen-label
        // and surviving-frontier counts — the evidence behind the
        // claim that most dedup mass leaves the frontier at round 0/1
        // instead of riding every large-star/small-star re-shuffle.
        // Optional third arg = freezeEvery for the r14 cadence A/B
        // (default 1 = the shipped freeze-every-round behavior).
        val freezeEvery =
          if (args.length > 2) args(2).toInt else 1
        println(s"d42cc freezeEvery=$freezeEvery")
        val heads = docs.select(col("doc_id"),
          substring(col("text"), 1, 120).as("head"))
        val edges = timed("d42 edges") {
          val e = graft.operators.EdJoin
            .editPairs(heads, "doc_id", "head", k = 2, q = 5)
            .select(col("id_a"), col("id_b"))
            .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
          println(s"  edges=${e.count()}")
          e
        }
        timed("d42 components") {
          val c = graft.operators.Dedup.connectedComponents(edges,
            onRound = (i, sec) => println(f"  round $i ${sec}%6.2f s"),
            onFreeze = Some((r, fr, act) => println(
              s"  freeze $r: frozen_labels=$fr active_edges=$act")),
            freezeEvery = freezeEvery)
          println(s"  labeled=${c.count()}")
        }
        // release the cached edge blocks like the other timed cases:
        // harmless in the one-shot CLI, but a leak if this case is
        // ever driven in-session alongside other diagnostics
        edges.unpersist()
      case "d41count" =>
        // the r12 sweep attributes d41's super-linear sf30 bytes to
        // OUTPUT quadraticity (cross-copy c_name suffixes are genuine
        // ed≤k pairs, C(copies,2) per base name) — this counts the
        // actual output so the attribution is measured, not argued
        val pairs = timed("d41 output") {
          SparkEntry.queries("d41_edit_pairs")(spark, dir).count()
        }
        println(s"  true_pairs=$pairs")
      case "d40parts" =>
        // phase split of the EdJoin gram path (diagnostic replica of
        // editPairs' stages) — attributing the sf10 write growth
        import org.apache.spark.sql.expressions.Window
        val s0 = docs
          .select(col("doc_id").as("_id"), col("lang"), col("source"),
            substring(col("text"), 1, 120).as("_str"))
          .filter(length(col("_str")) >= 6)
        val q6 = 6; val k = 6
        // mirrors editPairs' r12 hash keying (grams live as xxhash64
        // through every exchange) so the replica's candidate counts
        // track the shipped plan's rarity-order tie-breaking
        val grams = s0.select(col("_id"), explode(array_distinct(
          expr(s"transform(sequence(1, length(_str) - ${q6 - 1})," +
            s" i -> xxhash64(substring(_str, i, $q6)))"))).as("gram"))
        val dfreq = grams.groupBy(col("gram"))
          .agg(count(lit(1)).as("gram_df"))
        timed("grams+dfreq")(noop(dfreq))
        val byRarity = Window.partitionBy(col("_id"))
          .orderBy(col("gram_df"), col("gram"))
        val prefix = grams.join(dfreq, Seq("gram"))
          .withColumn("pos",
            org.apache.spark.sql.functions.row_number().over(byRarity))
          .filter(col("pos") <= k * q6 + 1)
          .select(col("_id"), col("gram"))
          .join(s0.withColumn("_len", length(col("_str"))), Seq("_id"))
        timed("prefix index")(noop(prefix))
        val n = spark.sparkContext.defaultParallelism
        val a = prefix.select(col("gram"), col("_id").as("id_a"),
            col("_str").as("sa"), col("_len").as("la"),
            col("lang"), col("source"))
          .repartition(n, col("id_a"))
        val b = prefix.select(col("gram"), col("_id").as("id_b"),
          col("_str").as("sb"), col("_len").as("lb"),
          col("lang"), col("source"))
        val cands = a.join(b, Seq("gram", "lang", "source"))
          .filter(col("id_a") < col("id_b"))
          .filter(abs(col("la") - col("lb")) <= k)
        println("candidate rows: " + timed("gram join count")(
          cands.count()))
      case _ =>
        val q = SparkEntry.queries("d51_curation_pipeline")
        val df = q(spark, dir)
        timed("full d51")(noop(df))
        println(df.queryExecution.executedPlan.toString.take(12000))
    }
    spark.stop()
  }
}
