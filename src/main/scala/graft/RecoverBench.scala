package graft

import graft.operators.Dedup
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Recovery cost at corpus scale (VERDICT r17 stretch #8): `recover()`
  * re-pins the base tier with one exchange and recounts every delta —
  * priced at gate SF by FoldingDurabilitySpec, unmeasured at corpus
  * scale until this. One reading: build a durable minhash folding
  * index over the sf10 corpus, fold two micro-batch-sized deltas,
  * then time (a) an in-session one-batch probe, (b) the recovery
  * itself in a fresh session view, (c) the first probe after
  * recovery. The honest comparison is (b)+(c) vs (a): what a restart
  * costs before the pipeline is back at steady state.
  *
  * Probe shape = `nearDupIngestStream`'s candidate join verbatim
  * (per-tier bucket join, per-tier sig fetch, jaccard filter), driven
  * batch-style so the reading isolates index cost from stream
  * machinery. Calm-gated like every r18 streaming reading.
  */
object RecoverBench {
  def main(args: Array[String]): Unit = {
    val corpusDir = args.headOption.getOrElse("target/scale/sf10")
    val probeN = if (args.length > 1) args(1).toInt else 3000
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val docs = Tables.load(spark, corpusDir, "documents")
    val corpusN = docs.count()
    val sigs = Dedup.minhashSignatures(docs, "doc_id", "text",
      shingleSize = 3, numHashes = 64)
    val durable = java.nio.file.Files
      .createTempDirectory("graft_recover_bench").toString

    def timed[A](body: => A): (A, Double) = {
      val t0 = System.nanoTime()
      val r = body
      (r, (System.nanoTime() - t0) / 1e9)
    }
    // one ingest-shaped probe batch against the index's current tiers
    // (the nearDupIngestStream candidate join, batch-driven)
    def probe(idx: Dedup.FoldingMinhashIndex,
              batch: DataFrame): Long = {
      val probes = Dedup.bandedBuckets(batch, 16, 4)
        .select(col("band"), col("band_hash"), col("id").as("new_id"))
      val cands = idx.buckets.currentTiers.map { t =>
        t.join(probes.hint("shuffle_hash"), Seq("band", "band_hash"))
          .filter(col("new_id") =!= col("id"))
          .select(col("new_id"), col("id").as("corpus_id"))
      }.reduce(_ unionByName _).distinct()
      idx.sigs.currentTiers.map { t =>
        t.select(col("id").as("corpus_id"), col("sig").as("corpus_sig"))
          .join(cands.hint("shuffle_hash"), Seq("corpus_id"))
      }.reduce(_ unionByName _)
        .join(batch.select(col("id").as("new_id"),
          col("sig").as("new_sig")).hint("shuffle_hash"), Seq("new_id"))
        .filter(Dedup.estimatedJaccard(col("new_sig"),
          col("corpus_sig")) >= 0.7)
        .count()
    }

    // build the durable index (base write outside every timed window)
    // and fold two micro-batch deltas so recovery has tiers to recount
    val buildLoad = Calm.awaitCalm()
    val idx = Dedup.foldingMinhashIndex(sigs, bands = 16,
      rowsPerBand = 4, numPartitions = cpus.toInt,
      durablePath = Some(durable))
    val foldBatch1 = sigs.filter(col("id") % 97 === 0)
      .withColumn("id", col("id") + corpusN * 10)
      .localCheckpoint(true)
    val foldBatch2 = sigs.filter(col("id") % 97 === 1)
      .withColumn("id", col("id") + corpusN * 20)
      .localCheckpoint(true)
    idx.sigs.foldInPinned(0L, foldBatch1)
    idx.buckets.foldIn(0L, foldBatch1)
    idx.sigs.foldInPinned(1L, foldBatch2)
    idx.buckets.foldIn(1L, foldBatch2)

    val probeBatch = sigs.filter(col("id") < probeN)
      .localCheckpoint(true)
    probeBatch.count()

    // (a) in-session probe — the steady-state cost
    val inLoad = Calm.awaitCalm()
    val (hitsIn, inSec) = timed(probe(idx, probeBatch))

    // (b) recovery in a fresh session view: disk is the only shared
    // state (the FoldingDurabilitySpec restart contract; same JVM, so
    // OS page cache behaves as a warm restart on the same host)
    val recLoad = Calm.awaitCalm()
    val (recovered, recSec) = timed(
      Dedup.recoverMinhashIndex(spark.newSession(), durable,
        bands = 16, rowsPerBand = 4, numPartitions = cpus.toInt))
    // (c) first probe after recovery
    val (hitsRec, firstSec) = timed(probe(recovered, probeBatch))

    def f(v: Double): String =
      "%.3f".formatLocal(java.util.Locale.US, v)
    println(s"""{"metric":"recover_bench","corpus_docs":$corpusN,""" +
      s""""probe_docs":$probeN,"tiers":${idx.sigs.meta.tiers},""" +
      s""""in_session_probe_sec":${f(inSec)},""" +
      s""""recover_sec":${f(recSec)},""" +
      s""""first_probe_after_recover_sec":${f(firstSec)},""" +
      s""""hits_in_session":$hitsIn,"hits_after_recover":$hitsRec,""" +
      s""""build_load":${f(buildLoad)},"probe_load":${f(inLoad)},""" +
      s""""recover_load":${f(recLoad)},""" +
      s""""calm":${inLoad < Calm.threshold && recLoad < Calm.threshold},""" +
      s""""sf":"$corpusDir"}""")
    spark.stop()
  }
}
