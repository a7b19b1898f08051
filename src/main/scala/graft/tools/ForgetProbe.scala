package graft.tools

import graft.operators.{Similarity, TextAnalysis}

/** Deletion-cost probe: times the forget REWRITES themselves (not the
  * search) at sf0.1 vs the 20x corpus. Physical deletion in an
  * immutable-file store is one pass over the index by construction, so
  * the honest scale claim is "forget costs ~one index rewrite" — this
  * probe measures that the pass is in fact ~linear (≈20x at 20x), not
  * superlinear. Usage: runMain graft.tools.ForgetProbe (after Stress20x).
  */
object ForgetProbe {
  def main(args: Array[String]): Unit = {
    val dirs = Seq("sf0.1" -> "/root/testdata/sf0.1", "20x" -> "/tmp/graft20x")
    val spark = graft.core.EngineSession.create("local[32]", 32)
    spark.sparkContext.setLogLevel("WARN")
    def time[T](body: => T): Double = {
      val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
    }
    def measure(dir: String): (Double, Double, Double, Double) = {
      val (p, f, st) = ("fgprobe_post", "fgprobe_df", "fgprobe_stats")
      val ivf = "fgprobe_ivf"
      Seq(p, f, st, ivf).foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
      val tBuild = time(TextAnalysis.bm25IndexWrites(spark, dir, p, f, st).foreach(_._2()))
      val tForget = time(TextAnalysis.forgetBm25Docs(spark,
        TextAnalysis.forgetDocIds(spark, dir), p, f, st))
      val tIvfBuild = time(Similarity.persistIvfIndex(spark, dir, ivf))
      val tIvfForget = time(Similarity.forgetIvfVectors(spark, ivf,
        Similarity.forgetVecIds(spark, dir)))
      Seq(p, f, st, ivf).foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
      (tBuild, tForget, tIvfBuild, tIvfForget)
    }
    // warm JIT/codegen off the clock (the first cold sequence otherwise
    // bills classloading to whichever dir runs first and inverts ratios)
    measure("/root/testdata/sf0.01")
    val results = dirs.map { case (tag, dir) =>
      // two sequences per dir, keep the second (steady) — build/rewrite
      // are IO-bound jobs whose first run still absorbs planner warmup
      measure(dir)
      val r = measure(dir)
      println(f"[forget] $tag%-6s bm25_build=${r._1}%.2f s bm25_forget=${r._2}%.2f s " +
        f"ivf_build=${r._3}%.2f s ivf_forget=${r._4}%.2f s")
      tag -> r
    }.toMap
    val (a, b) = (results("sf0.1"), results("20x"))
    println(f"[forget] RATIO bm25_build=${b._1 / a._1}%.1fx bm25_forget=${b._2 / a._2}%.1fx " +
      f"ivf_build=${b._3 / a._3}%.1fx ivf_forget=${b._4 / a._4}%.1fx")
    spark.stop()
  }
}
