package graft.tools

/** Dev probe for the retract-log retention policy gate: decision log +
  * wall time. Usage: runMain graft.tools.RetractPolicyProbe [sfDir]
  */
object RetractPolicyProbe {
  def main(args: Array[String]): Unit = {
    val dir = if (args.length > 0) args(0) else "/root/testdata/sf0.01"
    val spark = graft.core.EngineSession.create("local[32]", 32)
    spark.sparkContext.setLogLevel("WARN")
    val t0 = System.nanoTime()
    val (df, decisions) = graft.streaming.StreamGate.q4RetractPolicyWithLog(spark, dir)
    println(f"[rpolicy] rows=${df.count()} decisions=${decisions.map { case (n, f) =>
      s"$n${if (f) "=FIRE" else "=skip"}" }.mkString(",")} (${(System.nanoTime() - t0) / 1e9}%.1f s)")
    spark.stop()
  }
}
