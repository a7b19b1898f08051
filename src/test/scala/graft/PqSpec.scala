package graft

import graft.core.Tables
import graft.operators.{Clustering, Similarity}
import org.apache.spark.sql.functions._

/** IVF-PQ contract: fit/apply equality through the persisted model, and
  * recall against the EXACT integer-L2 top-k in the same quantized space
  * (the honest reference for an ADC search — cosine brute-force ranks by
  * a different metric).
  */
class PqSpec extends SparkSpec {

  /** Exact integer-L2 top-k per query (vec_id % 20), same query set and
    * tie-break as the PQ search.
    */
  private def exactTopk(dir: String): Map[Long, Set[Long]] = {
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

  private def recallOf(result: Array[org.apache.spark.sql.Row],
      exact: Map[Long, Set[Long]]): Double = {
    val got = result.groupBy(_.getLong(0))
      .map { case (k, rows) => k -> rows.map(r => r.getLong(2)).toSet }
    val per = exact.toSeq.map { case (q, truth) =>
      got.get(q).map(g => (g & truth).size.toDouble / truth.size).getOrElse(0.0)
    }
    per.sum / per.size
  }

  test("pq fit/apply: search against the persisted model equals the fit-inline search") {
    Similarity.persistPqModel(spark, Sf0001)
    val applied = Similarity.pqTopkAgainst(spark, Sf0001,
      Clustering.KmeansModelTable, Similarity.PqModelTable).collect()
    val inline = Similarity.pqTopkInline(spark, Sf0001, Similarity.NProbe).collect()
    assert(applied.length > 0)
    assert(applied.toSeq === inline.toSeq)
  }

  test("pq model table persists once: second call is a metadata probe (no refit)") {
    Similarity.persistPqModel(spark, Sf0001)
    assert(graft.core.ModelTables.isCurrent(spark, Similarity.PqModelTable,
      Sf0001, Similarity.PqFingerprint))
    // model shape: PqM slices × PqKc codewords of PqSliceDim dims
    val rows = spark.table(Similarity.PqModelTable).collect()
    assert(rows.length === Similarity.PqM * Similarity.PqKc)
    assert(rows.forall(_.getSeq[Long](2).length === Similarity.PqSliceDim))
  }

  test("pq recall: beats the scanned-fraction floor at nprobe, improves at full probe") {
    Similarity.persistPqModel(spark, Sf0001)
    val exact = exactTopk(Sf0001)
    val atProbe = recallOf(Similarity.pqTopkAgainst(spark, Sf0001,
      Clustering.KmeansModelTable, Similarity.PqModelTable, Similarity.NProbe).collect(), exact)
    val atFull = recallOf(Similarity.pqTopkAgainst(spark, Sf0001,
      Clustering.KmeansModelTable, Similarity.PqModelTable, Clustering.K).collect(), exact)
    // Context for the floors: the fixture embeddings are uniform-random —
    // ANN-adversarial (pairwise distances concentrate, neighbors are tiny
    // fluctuations), so absolute recall is capped by the data, not the
    // index: exact search restricted to the nprobe=3 probed lists reaches
    // 0.60, ADC-without-refine manages 0.13, ADC+refine measures 0.39.
    // The floors pin (a) a wide margin over random sampling — a random
    // PqRefine=50-of-500 pool has expected recall 0.10 — and (b) that
    // refine is actually wired in (pure-ADC's 0.13 fails the 0.3 floor).
    assert(atProbe > 0.3, s"nprobe recall $atProbe")
    // widening the probe widens the candidate pool (measured 0.39 → 0.42)
    assert(atFull >= atProbe, s"full-probe recall $atFull < nprobe recall $atProbe")
    assert(atFull > 0.35, s"full-probe recall $atFull")
  }
}
