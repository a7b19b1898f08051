package graft.tools

/** Dev probe for the per-family fragmentation-policy gates: run each
  * WithLog variant and print its decision log (ratio, fired) — the data
  * that picks the files-per-bucket thresholds.
  * Usage: runMain graft.tools.CompactPolicyProbe [sfDir] [families...]
  */
object CompactPolicyProbe {
  def main(args: Array[String]): Unit = {
    val dir = if (args.length > 0) args(0) else "/root/testdata/sf0.01"
    val fams = if (args.length > 1) args.drop(1).toSet else Set("bm25", "ivf", "pq", "mm", "dedup")
    val spark = graft.core.EngineSession.create("local[32]", 32)
    spark.sparkContext.setLogLevel("WARN")
    import graft.streaming.StreamGate
    def show(name: String, run: () => (org.apache.spark.sql.DataFrame, Seq[(Double, Boolean)])): Unit = {
      val t0 = System.nanoTime()
      try {
        val (df, decisions) = run()
        val n = df.count()
        println(f"[cpolicy] $name: rows=$n decisions=${decisions.map { case (r, f) =>
          f"${r}%.2f${if (f) "=FIRE" else "=skip"}" }.mkString(",")} " +
          f"(${(System.nanoTime() - t0) / 1e9}%.1f s)")
      } catch { case e: Throwable =>
        println(s"[cpolicy] $name FAILED: ${e.getMessage}")
      }
    }
    if (fams("dedup")) show("dedup", () => StreamGate.compactPolicyWithLog(spark, dir))
    if (fams("bm25")) show("bm25", () => StreamGate.compactPolicyBm25WithLog(spark, dir))
    if (fams("ivf")) show("ivf", () => StreamGate.compactPolicyIvfWithLog(spark, dir))
    if (fams("pq")) show("pq", () => StreamGate.compactPolicyPqWithLog(spark, dir))
    if (fams("mm")) show("mm", () => StreamGate.compactPolicyMmWithLog(spark, dir))
    spark.stop()
  }
}
