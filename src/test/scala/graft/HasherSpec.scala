package graft

import org.apache.spark.sql.functions._
import graft.operators.{MediaRecord, Multimodal}

/** The perceptual-hash seam's two bindings: [[Multimodal.ByteSimHashHasher]]
  * (md5-per-gram, SQL-replayable — the CORRECTNESS default) and
  * [[Multimodal.RollingMixHasher]] (rolling 32-bit window + SplitMix64
  * finalizer — the production binding that pays O(1) per byte instead of
  * one MessageDigest per gram). Pinned here:
  *  - the LOCALITY contract both hashers owe the banded dedup: few-byte
  *    corruption stays within the Hamming radius on the probe fixtures,
  *    unrelated payloads land far apart;
  *  - the dedup chain is HASHER-GENERIC: swapping the binding changes
  *    only the 60-bit values, and the banded equi-join still equals
  *    brute-force pairing at the radius (the pigeonhole bound holds for
  *    any 60-bit hash).
  */
class HasherSpec extends SparkSpec {

  private def rec(id: Long, kind: String, payload: Array[Byte]): MediaRecord =
    MediaRecord(id, kind, payload.length.toLong, payload)

  /** Deterministic pseudo-random payload (LCG — fixture stability across
    * JVMs matters more than distribution quality here).
    */
  private def payload(seed: Long, n: Int): Array[Byte] = {
    val out = new Array[Byte](n)
    var s = seed
    var i = 0
    while (i < n) {
      s = s * 6364136223846793005L + 1442695040888963407L
      out(i) = (s >>> 33).toByte
      i += 1
    }
    out
  }

  private def corrupt(p: Array[Byte], at: Int*): Array[Byte] = {
    val q = p.clone()
    at.foreach(i => q(i) = (q(i) ^ 0x5a).toByte)
    q
  }

  private def ham(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)

  private val hashers = Seq(
    "md5-standin" -> Multimodal.ByteSimHashHasher,
    "rolling-mix" -> Multimodal.RollingMixHasher)

  test("both hashers emit 60-bit values") {
    for ((name, h) <- hashers; seed <- 1L to 20L) {
      val v = h.phash(rec(seed, "image", payload(seed, 64 + seed.toInt)))
      assert((v >>> 60) === 0L, s"$name seed $seed overflows 60 bits")
    }
  }

  test("locality: few-byte corruption stays within the Hamming radius on the probe fixtures") {
    for ((name, h) <- hashers; seed <- 1L to 10L) {
      // SimHash locality is proportional: flips scale with the CORRUPTED
      // GRAM FRACTION, so the radius bound needs corruption small against
      // the payload (1-2 bytes of 4000 = <=8 of ~3997 grams, ~0.2%);
      // coarser corruption (2 of 400 bytes) measurably flips ~8 bits
      val base = payload(seed * 7919, 4000)
      val orig = h.phash(rec(1, "image", base))
      for (c <- Seq(corrupt(base, 500), corrupt(base, 1234, 3077))) {
        val d = ham(orig, h.phash(rec(2, "image", c)))
        assert(d <= Multimodal.PhashMaxHamming,
          s"$name seed $seed: corruption moved the hash $d bits")
      }
    }
  }

  test("separation: unrelated payloads land far beyond the radius") {
    for ((name, h) <- hashers) {
      val ds = (1L to 10L).map(s => h.phash(rec(s, "image", payload(s * 104729 + 17, 400))))
      for (i <- ds.indices; j <- ds.indices if i < j) {
        val d = ham(ds(i), ds(j))
        assert(d > 3 * Multimodal.PhashMaxHamming,
          s"$name fixtures $i/$j collide at Hamming $d")
      }
    }
  }

  test("phashDedup is hasher-generic: banded verdicts equal brute-force pairing for the rolling hasher") {
    import spark.implicits._
    val got = Multimodal.phashDedupWith(spark, Sf0001, Multimodal.RollingMixHasher)
      .collect().map(r => (r.getLong(0), r.getBoolean(2), r.getLong(3), r.getLong(4)))
    // independent driver-side formulation: hash every record with the
    // rolling hasher, brute-force all same-kind pairs, keep unless a
    // lower-id doc sits within the radius (closest, then smallest id)
    val recs = Multimodal.mediaRecords(spark, Sf0001).collect()
    val ph = recs.map(r => (r.doc_id, r.kind, Multimodal.RollingMixHasher.phash(r)))
    val want = ph.sortBy(_._1).map { case (id, kind, h) =>
      val cands = ph.filter(c => c._2 == kind && c._1 < id)
        .map(c => (ham(h, c._3), c._1))
        .filter(_._1 <= Multimodal.PhashMaxHamming)
      if (cands.isEmpty) (id, true, -1L, -1L)
      else { val m = cands.min; (id, false, m._2, m._1.toLong) }
    }
    assert(got.toSeq === want.toSeq)
    // non-vacuity: the fixture must exercise the suppression path
    assert(want.exists(!_._2), "no near-dups under the rolling hasher — vacuous")
    // and the default binding is unchanged by the refactor
    assert(Multimodal.phashDedup(spark, Sf0001).collect().map(_.toString).toSeq ===
      Multimodal.phashDedupWith(spark, Sf0001, Multimodal.ByteSimHashHasher)
        .collect().map(_.toString).toSeq)
  }
}
