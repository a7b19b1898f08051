package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.operators.{Clustering, Similarity}

/** ANN recall report: recall@10 of every approximate search family
  * against its exact baseline at a given SF, swept over the family's
  * accuracy knob (nprobe / Hamming radius) — the accuracy side of the
  * accuracy/cost trade-off the stress probes measure the cost side of.
  *
  * Baselines are per-metric-space, stated per row: the cosine families
  * (IVF over labels, IVF over learned centroids, multi-probe LSH) are
  * scored against the brute-force cosine top-10; IVF-PQ runs ADC over
  * integer-quantized vectors, so its honest reference is the exact
  * integer-L2 top-10 in that same quantized space (same convention as
  * PqSpec — comparing an L2 searcher against a cosine truth would
  * conflate metric mismatch with index quality).
  *
  * Usage: runMain graft.tools.RecallReport [sfDir]
  */
object RecallReport {

  private def neighborSets(df: DataFrame): Map[Long, Set[Long]] =
    df.select("q_id", "neighbor_id").collect()
      .groupBy(_.getLong(0)).map { case (k, rows) => k -> rows.map(_.getLong(1)).toSet }

  private def recall(got: Map[Long, Set[Long]], truth: Map[Long, Set[Long]]): Double = {
    val per = truth.toSeq.map { case (q, t) =>
      got.get(q).map(g => (g & t).size.toDouble / t.size).getOrElse(0.0)
    }
    per.sum / per.size
  }

  /** Exact integer-L2 top-10 in the quantized space (the PQ baseline). */
  private def exactQuantizedTopk(spark: SparkSession, dir: String): Map[Long, Set[Long]] = {
    import org.apache.spark.sql.expressions.Window
    val e = Tables.load(spark, dir, "embeddings")
      .selectExpr("vec_id", Clustering.quantizeSql)
    val q = e.filter(col("vec_id") % 20 === 0)
      .select(col("vec_id").as("q_id"), col("q").as("q_q"))
    val w = Window.partitionBy("q_id").orderBy(col("d"), col("vec_id"))
    e.join(broadcast(q), col("vec_id") =!= col("q_id"))
      .withColumn("d", expr(
        "aggregate(zip_with(q, q_q, (a, b) -> (a - b) * (a - b)), 0L, (acc, x) -> acc + x)"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= Similarity.TopK)
      .select("q_id", "vec_id").collect()
      .groupBy(_.getLong(0)).map { case (k, rows) => k -> rows.map(_.getLong(1)).toSet }
  }

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = graft.core.EngineSession.create("local[32]", 32)
    spark.sparkContext.setLogLevel("WARN")
    println(s"[recall] dir=$dir k=${Similarity.TopK} queries=vec_id%20==0")

    val cosineTruth = neighborSets(Similarity.topkBruteforce(spark, dir))
    for (np <- Seq(1, 3, 5, 10))
      println(f"[recall] ivf_label      nprobe=$np%-2d recall@10=" +
        f"${recall(neighborSets(Similarity.ivfTopkProbe(spark, dir, np)), cosineTruth)}%.3f  (vs cosine exact)")
    for (np <- Seq(1, 3, 5, 10))
      println(f"[recall] ivf_kmeans     nprobe=$np%-2d recall@10=" +
        f"${recall(neighborSets(Similarity.ivfKmeansTopkProbe(spark, dir, np)), cosineTruth)}%.3f  (vs cosine exact)")
    for (h <- Seq(0, 1, 2, 4, 6))
      println(f"[recall] multiprobe_lsh radius=$h%-2d recall@10=" +
        f"${recall(neighborSets(Similarity.multiprobeTopkRadius(spark, dir, h)), cosineTruth)}%.3f  (vs cosine exact)")

    // hybrid retrieval: the IVF-served fusion vs the exact fusion — what
    // swapping the brute-force semantic leg for the persisted index costs
    def fusedSets(df: DataFrame): Map[Long, Set[Long]] =
      neighborSets(df.select(col("query_id").as("q_id"),
        col("doc_id").as("neighbor_id")))
    val hybridTruth = fusedSets(Similarity.hybridRrf(spark, dir))
    for (np <- Seq(1, 3, 5, 10))
      println(f"[recall] hybrid_rrf_ivf nprobe=$np%-2d recall@10=" +
        f"${recall(fusedSets(Similarity.hybridRrfIvfProbe(spark, dir, np)), hybridTruth)}%.3f  (vs exact-fused rrf)")

    val pqTruth = exactQuantizedTopk(spark, dir)
    Similarity.persistPqModel(spark, dir)
    for (np <- Seq(1, 3, 5, 10))
      println(f"[recall] ivf_pq         nprobe=$np%-2d recall@10=" +
        f"${recall(neighborSets(Similarity.pqTopkAgainst(spark, dir, Clustering.KmeansModelTable, Similarity.PqModelTable, np)), pqTruth)}%.3f  (vs quantized-L2 exact)")
    // once the probed lists cover the truth, the ADC pool width is the
    // binding recall knob (12-bit codes rank coarsely; the exact re-rank
    // can only recover what the pool nominates) — sweep it at full probe
    for (rf <- Seq(Similarity.PqRefine, 2 * Similarity.PqRefine,
        4 * Similarity.PqRefine, 8 * Similarity.PqRefine))
      println(f"[recall] ivf_pq         nprobe=10 refine=$rf%-4d recall@10=" +
        f"${recall(neighborSets(Similarity.pqTopkAgainst(spark, dir, Clustering.KmeansModelTable, Similarity.PqModelTable, 10, rf)), pqTruth)}%.3f  (vs quantized-L2 exact)")
    spark.stop()
  }
}
