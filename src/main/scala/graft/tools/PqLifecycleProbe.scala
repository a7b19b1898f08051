package graft.tools

import org.apache.spark.sql.functions._
import graft.operators.Similarity

/** Scale probe for the PQ index lifecycle verbs at sf0.1 vs the 20x
  * corpus (run Stress20x first): BUILD (two coupled Lloyd levels + encode
  * + bucketed write), ADMIT (frozen-model map-only encode + append — the
  * steady-state verb, must stay O(batch)), FORGET (one anti-join bucket
  * rewrite), RETRAIN (re-fit both levels on current content + re-encode
  * rewrite — the drift repair, ~linear in the index by construction like
  * the IVF rebalance). Superlinear growth is the smoke being hunted.
  * Usage: runMain graft.tools.PqLifecycleProbe (after Stress20x).
  */
object PqLifecycleProbe {
  def main(args: Array[String]): Unit = {
    val dirs = Seq("sf0.1" -> "/root/testdata/sf0.1", "20x" -> "/tmp/graft20x")
    val spark = graft.core.EngineSession.create("local[32]", 32)
    spark.sparkContext.setLogLevel("WARN")
    def time[T](body: => T): Double = {
      val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
    }
    def measure(dir: String): (Double, Double, Double, Double) = {
      val (t, c, b) = ("pqprobe_t", "pqprobe_c", "pqprobe_b")
      Seq(t, c, b).foreach(x => spark.sql(s"DROP TABLE IF EXISTS $x"))
      val all = graft.core.Tables.load(spark, dir, "embeddings")
        .select("vec_id", "embedding")
      val tBuild = time(Similarity.buildPqIndex(spark,
        all.filter(col("vec_id") % Similarity.IvfRbIngestMod =!= 0), t, c, b))
      val tAdmit = time(Similarity.pqAdmit(
        all.filter(col("vec_id") % Similarity.IvfRbIngestMod === 0), t, c, b))
      val tForget = time(Similarity.forgetPqVectors(spark, t,
        Similarity.forgetVecIds(spark, dir)))
      val tRetrain = time(Similarity.retrainPq(spark, dir, t, c, b))
      Seq(t, c, b).foreach(x => spark.sql(s"DROP TABLE IF EXISTS $x"))
      (tBuild, tAdmit, tForget, tRetrain)
    }
    // warm JIT/codegen off the clock, then two sequences per dir keeping
    // the second (steady) — same discipline as ForgetProbe
    measure("/root/testdata/sf0.01")
    val results = dirs.map { case (tag, dir) =>
      measure(dir)
      val r = measure(dir)
      println(f"[pqlc] $tag%-6s build=${r._1}%.2f s admit=${r._2}%.2f s " +
        f"forget=${r._3}%.2f s retrain=${r._4}%.2f s")
      tag -> r
    }.toMap
    val (a, b) = (results("sf0.1"), results("20x"))
    println(f"[pqlc] RATIO build=${b._1 / a._1}%.1fx admit=${b._2 / a._2}%.1fx " +
      f"forget=${b._3 / a._3}%.1fx retrain=${b._4 / a._4}%.1fx")
    spark.stop()
  }
}
