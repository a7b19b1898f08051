package graft.tools

/** Fixed-q scale probe for the PQ-served hybrid's semantic leg: run the
  * leg at a stride proportional to the corpus multiple so the QUERY
  * COUNT stays the sf0.1 count — isolating per-query corpus cost (the
  * ADC candidate pool) from query-set growth. Usage:
  *   runMain graft.tools.PqHybridStress <dir> <stride> [n]
  */
object PqHybridStress {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val stride = args(1).toInt
    val n = if (args.length > 2) args(2).toInt else 3
    val spark = graft.core.EngineSession.create("local[32]", 32)
    spark.sparkContext.setLogLevel("WARN")
    for (i <- 1 to n) {
      spark.catalog.clearCache(); System.gc()
      val t0 = System.nanoTime()
      graft.operators.Similarity.pqHybridSemLegStride(spark, dir, stride)
        .write.format("noop").mode("overwrite").save()
      println(f"[pqstress] stride=$stride run $i: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    spark.stop()
  }
}
