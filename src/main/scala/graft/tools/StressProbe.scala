package graft.tools

/** Scale-stress runner over the 20x corpus written by [[Stress20x]]: for
  * each named query, warm the JIT once on a small dir, then time 3 runs
  * at sf0.1 and 3 at the 20x dir in the SAME JVM, and print the cold and
  * steady 20x/sf0.1 cost ratios. The trained-model families key their
  * persisted tables on the source dir, so per dir run 1 pays fit+score
  * ("cold") and runs 2-3 the stored-model apply path ("steady") — the two
  * ratios separate "does the FIT scale" from "does the APPLY scale".
  * 20x data at ~20x cost is the linear baseline; superlinear is the bug.
  * Usage: runMain graft.tools.StressProbe <name>[,<name>...]
  */
object StressProbe {
  def main(args: Array[String]): Unit = {
    val names = args(0).split(",").map(_.trim).filter(_.nonEmpty)
    val warmDir = "/root/testdata/sf0.01"
    val dirs = Seq("sf0.1" -> "/root/testdata/sf0.1", "20x" -> "/tmp/graft20x")
    val spark = graft.core.EngineSession.create("local[32]", 32)
    spark.sparkContext.setLogLevel("WARN")
    for (name <- names) {
      val fn = graft.SparkEntry.queries(name)
      fn(spark, warmDir).write.format("noop").mode("overwrite").save()
      val t = dirs.map { case (tag, dir) =>
        val runs = (1 to 3).map { _ =>
          spark.catalog.clearCache(); System.gc()
          val t0 = System.nanoTime()
          fn(spark, dir).write.format("noop").mode("overwrite").save()
          (System.nanoTime() - t0) / 1e9
        }
        println(f"[stress] $name $tag%-6s cold=${runs.head}%.2f s steady=${runs.tail.min}%.2f s")
        tag -> runs
      }.toMap
      println(f"[stress] $name RATIO cold=${t("20x").head / t("sf0.1").head}%.1fx " +
        f"steady=${t("20x").tail.min / t("sf0.1").tail.min}%.1fx")
    }
    spark.stop()
  }
}
