package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Semantics of the d51 curation funnel — the stage INTERACTIONS the
  * scaladoc claims, each on a corpus constructed to trip a mis-ordered
  * or mis-wired pipeline:
  *  - dedup-before-split: only the min-id copy of a duplicated text
  *    survives (and identical texts could never straddle splits);
  *  - decontam-sees-splits: a train doc containing a VAL/TEST survivor
  *    verbatim is dropped; the same containment between two train
  *    docs is NOT a leak and survives;
  *  - gate-before-decontam ordering: a doc dropped by the quality
  *    gate never counts as contamination (and, because the gate keeps
  *    only >= 16-token docs, every eval doc that DOES reach decontam
  *    is seedable by the 8-gram probe);
  *  - mixture-after-clean: the per-language rates follow the observed
  *    survivor counts (a uniform corpus keeps rate 100 and drops
  *    nothing at the mixture stage).
  */
class CurationSpec extends SparkSpec {

  private def runOn(rows: Seq[(Long, String, String, String)]): DataFrame = {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_curation").toString
    rows.toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars", length(col("text")))
      .select("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    SparkEntry.queries("d51_curation_pipeline")(spark, dir)
  }

  // 20 distinct filler tokens keep a doc inside the [16, 90]-token gate
  private def filler(seed: String): String =
    (1 to 20).map(i => s"$seed$i").mkString(" ")

  test("exact dedup keeps the min-id copy only") {
    val t = filler("alpha")
    val out = runOn(Seq(
      (10L, t, "en", "src0"),
      (3L, t, "en", "src0"),
      (7L, filler("beta"), "en", "src0"))).collect()
    val ids = out.map(_.getLong(0)).toSet
    assert(ids.contains(3L) && !ids.contains(10L),
      s"expected min-id winner 3 and loser 10 dropped, got $ids")
  }

  test("train doc containing a val/test survivor is dropped; " +
    "train-train containment is not a leak") {
    // force split membership by probing buckets: generate candidate
    // texts until one lands train and one lands val/test under the
    // same content fold the pipeline uses.
    def bucket(s: String): Long = {
      var h = 0L
      s.foreach(c => h = (h * 31 + c.toInt) % 1000000007L)
      h % 100
    }
    val evalText = Iterator.from(0).map(i =>
        (1 to 16).map(j => s"needle$i$j").mkString(" "))
      .find(t => bucket(t) >= 80).get
    // a train-split host containing the eval text verbatim
    val host = Iterator.from(0).map(i =>
        s"host$i start ${evalText} end " +
          (1 to 12).map(j => s"pad$i$j").mkString(" "))
      .find(t => bucket(t) < 80).get
    // a train-split host containing ANOTHER TRAIN doc: not a leak
    val trainInner = Iterator.from(0).map(i =>
        (1 to 16).map(j => s"inner$i$j").mkString(" "))
      .find(t => bucket(t) < 80).get
    val trainHost = Iterator.from(0).map(i =>
        s"th$i open ${trainInner} close " +
          (1 to 12).map(j => s"tp$i$j").mkString(" "))
      .find(t => bucket(t) < 80).get
    val out = runOn(Seq(
      (1L, host, "en", "src0"),
      (2L, evalText, "en", "src0"),
      (3L, trainHost, "en", "src0"),
      (4L, trainInner, "en", "src0"))).collect()
    val ids = out.map(_.getLong(0)).toSet
    assert(!ids.contains(1L), "leaky train host must be dropped")
    assert(ids.contains(2L), "the eval doc itself survives")
    assert(ids.contains(3L) && ids.contains(4L),
      "train-train containment is not a leak")
  }

  test("gate runs before decontam: a host containing a gated-out " +
    "short doc is not leaky") {
    def bucket(s: String): Long = {
      var h = 0L
      s.foreach(c => h = (h * 31 + c.toInt) % 1000000007L)
      h % 100
    }
    // 3-token eval text (below the seeded probe's 8-token bound) that
    // lands in val/test... but ALSO below the 16-token quality gate —
    // so the pipeline's gate must drop it BEFORE decontam, and its
    // host must NOT be treated as leaky (the gate/decontam ordering).
    val shortEval = Iterator.from(0)
      .map(i => s"tiny$i needle gram")
      .find(t => bucket(t) >= 80).get
    val host = Iterator.from(0).map(i =>
        s"h$i open ${shortEval} close " +
          (1 to 14).map(j => s"hp$i$j").mkString(" "))
      .find(t => bucket(t) < 80).get
    val out = runOn(Seq(
      (1L, host, "en", "src0"),
      (2L, shortEval, "en", "src0"))).collect()
    val ids = out.map(_.getLong(0)).toSet
    assert(!ids.contains(2L), "3-token doc fails the length gate")
    assert(ids.contains(1L),
      "host survives: the contained doc never entered the corpus")
  }

  test("plan: scans prune n_chars; rates broadcast; no cartesian on " +
    "the data path") {
    val df = SparkEntry.queries("d51_curation_pipeline")(
      spark, "/root/testdata/sf0.001")
    val p = df.queryExecution.executedPlan.toString
    val reads = "ReadSchema: struct<([^>]*)>".r
      .findAllMatchIn(p).map(_.group(1)).toSeq
    assert(reads.nonEmpty)
    reads.foreach { r =>
      val cols = r.split(",").map(_.takeWhile(_ != ':').trim).toSet
      assert(cols.subsetOf(Set("doc_id", "text", "lang", "source")),
        s"over-wide scan: $r")
    }
    // the per-language rates and grand totals ride broadcasts; the only
    // nested-loop is the broadcast 1-row grand frame, never data×data
    assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastExchange"))
    assert(!p.contains("CartesianProduct"), p)
    // the decontam candidate join against trainIdx (one row per train
    // gram — corpus-scaled, explode-derived: the d41 broadcast kill
    // class) is merge-pinned in Decontam.probe. At this fixture SF
    // every UNPINNED join auto-broadcasts, so a SortMergeJoin in the
    // plan can only be the pin holding.
    assert(p.contains("SortMergeJoin"),
      s"trainIdx merge pin missing from the decontam stage:\n${p.take(800)}")
  }

  test("uniform corpus keeps mixture rate at 100% and drops nothing " +
    "at the mixture stage") {
    // 2 langs × 3 docs each, all distinct, no containment: every doc
    // that passes the gate must appear (rate = total/n/cnt = 100%).
    val rows = (for {
      (lang, li) <- Seq("en", "fr").zipWithIndex
      d <- 0 until 3
    } yield ((li * 3 + d).toLong,
      (1 to 20).map(j => s"u$lang$d$j").mkString(" "), lang, "src0"))
    val out = runOn(rows).collect()
    assert(out.length == 6, s"expected all 6 docs, got ${out.length}")
    assert(out.map(_.getString(1)).toSet == Set("en", "fr"))
  }
}
