package graft

import graft.operators.Dedup

/** Calibration of the LSH banding math: for minhash signatures whose
  * positions agree with probability J, a pair must become a candidate
  * with probability 1 − (1 − J^r)^b. The dedup family's rows-only
  * queries lean on this curve (bandsFor picks (b, r) from it), so pin
  * it empirically: synthetic signatures with controlled per-position
  * agreement, candidates from the SAME banding implementation the
  * batch self-join and streaming probe share.
  */
class LshCalibrationSpec extends SparkSpec {
  import spark.implicits._

  // splitmix64-style deterministic pseudo-randomness (no RNG state)
  private def h(seed: Long): Long = {
    var x = seed * 0x9E3779B97F4A7C15L
    x ^= x >>> 32; x *= 0xBF58476D1CE4E5B9L; x ^= x >>> 29; x
  }
  private def u01(seed: Long): Double =
    (h(seed) >>> 11).toDouble / (1L << 53).toDouble

  test("banding candidate rate tracks 1-(1-J^r)^b across J") {
    val bands = 16; val rpb = 4; val nh = bands * rpb
    val js = Seq(0.2, 0.4, 0.5, 0.6, 0.8)
    val pairsPerJ = 400
    val rows = for {
      (j, ji) <- js.zipWithIndex
      p <- 0 until pairsPerJ
      side <- 0 to 1
    } yield {
      val pid = (ji * pairsPerJ + p).toLong
      val sig = (0 until nh).map { pos =>
        val shared = h(pid * 1000003L + pos)
        val unshared = h(pid * 1000003L + pos + 500000L * (side + 1))
        if (u01(pid * 7919L + pos * 31L) < j) shared else unshared
      }.toArray
      (pid * 2 + side, sig)
    }
    val sigs = rows.toDF("id", "sig")
    val cands = Dedup.minhashLshPairsFromSigs(
        sigs, bands, rpb, threshold = 0.0)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet

    for ((j, ji) <- js.zipWithIndex) {
      val hits = (0 until pairsPerJ).count { p =>
        val pid = (ji * pairsPerJ + p).toLong
        cands.contains((pid * 2, pid * 2 + 1))
      }
      val emp = hits.toDouble / pairsPerJ
      val theory = 1.0 - math.pow(1.0 - math.pow(j, rpb), bands)
      assert(math.abs(emp - theory) < 0.08,
        s"J=$j: empirical $emp vs theoretical $theory")
    }
  }

  test("bandsFor crossover sits near the requested threshold") {
    for (t <- Seq(0.3, 0.5, 0.7)) {
      val (b, r) = Dedup.bandsFor(t, numHashes = 64)
      assert(b * r == 64)
      // at the crossover J* = (1/b)^(1/r), candidate probability is
      // ~1 - 1/e ≈ 0.63; it must sit within ±0.15 of the request
      val crossover = math.pow(1.0 / b, 1.0 / r)
      assert(math.abs(crossover - t) < 0.15,
        s"threshold $t got ($b, $r) with crossover $crossover")
    }
  }
}
