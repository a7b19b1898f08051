package graft.tools

/** Dev probe: run one SparkEntry query N times in a single JVM and print
  * per-run wall times — separates steady-state cost from first-run
  * JIT/codegen warmup when deciding what belongs in the bench warmup.
  * Usage: runMain graft.tools.QueryProbe <name> [sfDir] [n]
  */
object QueryProbe {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val n = if (args.length > 2) args(2).toInt else 3
    val spark = graft.core.EngineSession.create("local[32]", 32)
    spark.sparkContext.setLogLevel("WARN")
    val fn = graft.SparkEntry.queries(name)
    // optional JIT warmup against a SMALL dir (sf0.01) so run 1 at the
    // probe dir measures fit+score, not codegen/C2 compilation: the
    // trained-model families key their persisted tables on the dir, so a
    // warm-dir run fits ITS dir's model and leaves the probe dir cold
    sys.env.get("SPARK_GRAFT_WARM_DIR").foreach { wd =>
      fn(spark, wd).write.format("noop").mode("overwrite").save()
      println(s"[probe] $name warmed on $wd")
    }
    for (i <- 1 to n) {
      spark.catalog.clearCache(); System.gc()
      val t0 = System.nanoTime()
      fn(spark, dir).write.format("noop").mode("overwrite").save()
      println(f"[probe] $name run $i: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    spark.stop()
  }
}
