package graft.tools

import org.apache.spark.sql.functions._

/** Measures the IVF list-skew trajectory the `stream_ivf_policy` gate's
  * trigger threshold is calibrated against: commissioning skew after the
  * two-thirds build, steady skew after each uniform ingest chunk, and the
  * spike after the cluster-correlated forget (the 4 smallest lists under
  * the initial model — the "one tenant leaves" hollow-out). Run per SF:
  *   sbt "runMain graft.tools.IvfSkewProbe /root/testdata/sf0.001"
  */
object IvfSkewProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = graft.core.EngineSession.create("local[8]", 8)
    spark.sparkContext.setLogLevel("ERROR")
    import graft.operators.{Clustering, Similarity}
    val all = graft.core.Tables.load(spark, dir, "embeddings")
      .select("vec_id", "embedding")
    val build = all.filter(col("vec_id") % Similarity.IvfRbIngestMod =!= 0)
    val cents = Clustering.fitCentroidsOn(
      build.selectExpr("vec_id", Clustering.quantizeSql), Clustering.K)
    def skewOf(content: org.apache.spark.sql.DataFrame): (Double, Seq[Long]) = {
      val sizes = Clustering.withAssignment(
          content.selectExpr("vec_id", Clustering.quantizeSql), cents)
        .groupBy("best.cid").count().collect().map(_.getLong(1)).toSeq.sorted
      (sizes.max * Clustering.K.toDouble / sizes.sum, sizes)
    }
    val (s0, sz0) = skewOf(build)
    println(s"[$dir] build skew=$s0 sizes=$sz0")
    // uniform admit prefixes (thirds of the ingest set by vec_id)
    val ing = all.filter(col("vec_id") % Similarity.IvfRbIngestMod === 0)
    val b = ing.agg(min("vec_id"), max("vec_id")).head()
    val (lo, span) = (b.getLong(0), b.getLong(1) - b.getLong(0) + 1)
    (1 to 3).foreach { i =>
      val prefix = ing.filter((col("vec_id") - lo) * 3 / span < i)
      val (s, _) = skewOf(build.union(prefix))
      println(s"[$dir] after chunk $i skew=$s")
    }
    // hollow-out: delete the 4 smallest lists (by count, cid tie) of the
    // FULL content under the initial model
    val assigned = Clustering.withAssignment(
      all.selectExpr("vec_id", Clustering.quantizeSql), cents)
    val sizes = assigned.groupBy("best.cid").count().collect()
      .map(r => (r.getInt(0), r.getLong(1))).sortBy(t => (t._2, t._1))
    val doomed = sizes.take(4).map(_._1).toSet
    println(s"[$dir] full sizes=${sizes.mkString(",")} doomed=$doomed")
    val surv = all.join(
      assigned.filter(!col("best.cid").isin(doomed.toSeq: _*)).select("vec_id"),
      Seq("vec_id"))
    val (s1, sz1) = skewOf(surv)
    val frac = sizes.filter(t => doomed(t._1)).map(_._2).sum.toDouble /
      sizes.map(_._2).sum
    println(s"[$dir] post-forget skew=$s1 sizes=$sz1 deletedFrac=$frac")
    spark.stop()
  }
}
