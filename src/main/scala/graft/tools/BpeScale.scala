package graft.tools

import graft.operators.TextAnalysis

/** BPE batched-learning scale demonstration: learn a REALISTIC merge
  * count (64 — 8x the gated query's oracle depth) at batch widths 1 / 4 /
  * 16 / 32 over the sf0.1 documents and print wall time plus the number
  * of driver-sequenced rounds each width actually ran. Two claims under
  * measurement:
  *
  *  1. EQUALITY — every width learns the IDENTICAL merge list (the
  *     provable batch rule in [[TextAnalysis.bpeLearnBatched]]'s
  *     scaladoc, here exercised at 64 merges instead of the oracle's 8);
  *     the tool asserts list equality against width 1.
  *  2. ROUNDS, NOT MERGES — wall time tracks the round count (≈ merges /
  *     accepted width), the driver-sequencing bound: a 32k-merge
  *     tokenizer at width k costs O(32k/k) Spark job waves, and width is
  *     the knob that keeps the driver out of the critical path.
  *
  * Usage: runMain graft.tools.BpeScale [nMerges]
  */
object BpeScale {
  def main(args: Array[String]): Unit = {
    val nMerges = args.headOption.flatMap(_.toIntOption).getOrElse(64)
    val dir = "/root/testdata/sf0.1"
    val spark = graft.core.EngineSession.create("local[32]", 32)
    spark.sparkContext.setLogLevel("WARN")
    // warm the word-freq/pair-count codegen off the clock
    TextAnalysis.bpeLearnBatchedN(spark, "/root/testdata/sf0.01", 8, 4)
    var reference: Seq[(Long, String, String, Long)] = null
    for (k <- Seq(1, 4, 16, 32)) {
      val t0 = System.nanoTime()
      val (df, rounds) = TextAnalysis.bpeLearnBatchedN(spark, dir, nMerges, k)
      val got = df.collect().map(r =>
        (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3))).toSeq
      val secs = (System.nanoTime() - t0) / 1e9
      if (reference == null) reference = got
      else require(got == reference,
        s"width-$k merge list diverged from width-1 at $nMerges merges")
      println(f"[bpescale] merges=$nMerges width=$k%-2d rounds=$rounds%-3d " +
        f"wall=$secs%6.1f s  (merge lists identical: ${reference == got})")
    }
    spark.stop()
  }
}
