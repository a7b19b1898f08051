package graft.tools

import org.apache.spark.sql.functions._

/** Fixed-query 20x probes for the round-20 additions. The raw gates
  * compound query-set growth with corpus growth (a 20x corpus also has
  * 20x stride queries — `txt_bm25_gen` raw measured ~300 s/run at 20x
  * purely from the ~10k-literal term predicate), so, like every other
  * fixed-q row in SCALE.md, these hold the NEW mechanism's inputs fixed
  * and measure what the round actually added:
  *   1. the deletion WAVE itself (resolve + publish + five fenced
  *      rewrites + markers) on 20x-built index tables;
  *   2. a resumed (fully-applied) wave — the steady no-op;
  *   3. the generation-pointer read + a fixed-query search through it;
  *   4. the lake percolation scorer with a FIXED standing set over 20x
  *      arriving docs;
  *   5. the per-batch model re-resolution the refreshing serve stream
  *      pays (marker listing + K-row coarse + PqM x PqKc codebooks).
  *
  * Usage: runMain graft.tools.R20Probe [dir] (default /tmp/graft20x)
  */
object R20Probe {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/tmp/graft20x"
    val spark = graft.core.EngineSession.create("local[32]", 32)
    spark.sparkContext.setLogLevel("WARN")
    import graft.operators.{Dedup, ForgetWave, Multimodal, Similarity, TextAnalysis}
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[r20probe] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    // replica-0 of the 20x corpus = the original sf0.1 ids
    val nDocs = 5000L
    val wv = Seq("r20_post", "r20_df", "r20_stats", "r20_bands", "r20_ivf",
      "r20_pq", "r20_pq_coarse", "r20_pq_books", "r20_phash")
    wv.foreach(tb => graft.core.ModelTables.dropBothLayers(spark, tb))
    t("wave build (nine index tables)") {
      ForgetWave.buildEntries(spark, dir, wv(0), wv(1), wv(2), wv(3), wv(4),
        wv(5), wv(6), wv(7), wv(8)).foreach(_._2())
    }
    val fams = ForgetWave.standardFamilies(spark, dir, wv(0), wv(1), wv(2),
      wv(3), wv(4), wv(5), wv(6), wv(7), wv(8))
    val waveDir = java.nio.file.Files.createTempDirectory("r20wave")
      .resolve("wave").toString
    t("ForgetWave.run (resolve + publish + five rewrites)") {
      ForgetWave.run(spark, waveDir, fams)
    }
    t("ForgetWave.run resumed no-op") {
      ForgetWave.run(spark, waveDir, fams)
    }
    // generation pointer: init from the post-wave corpus, one rewrite,
    // fixed-query search through the pointer
    TextAnalysis.bm25GenDropAll(spark, "r20gen")
    t("bm25 generation init (gen 0 build)") {
      TextAnalysis.bm25GenInit(spark, "r20gen", TextAnalysis.bm25Corpus(spark, dir))
    }
    t("bm25 generation rewrite (gen 1 publish + sweep)") {
      TextAnalysis.bm25GenRewrite(spark, "r20gen")(
        _.filter(col("doc_id") % 17 =!= 3))
    }
    val fixedQ = TextAnalysis.bm25QueriesOf(TextAnalysis.bm25Corpus(spark, dir))
      .filter(col("query_id") < nDocs)
    (1 to 3).foreach { i =>
      t(s"fixed-q search through the pointer, run $i") {
        TextAnalysis.bm25SearchAgainstGen(spark, fixedQ, "r20gen")
          .write.format("noop").mode("overwrite").save()
      }
    }
    // lake percolation scorer, FIXED standing set (replica-0 seeds)
    val standing = TextAnalysis.bm25StandingQueriesDf(spark, dir,
      col("doc_id") < nDocs)
    (1 to 3).foreach { i =>
      t(s"lake scorer over 20x arrivals, fixed standing set, run $i") {
        TextAnalysis.bm25ScoreDocsDf(
            graft.core.Tables.load(spark, dir, "documents"), standing,
            wv(1), wv(2))
          .write.format("noop").mode("overwrite").save()
      }
    }
    // per-batch model re-resolution cost (bounded model rows — the price
    // the refreshing serve stream pays at every micro-batch boundary)
    (1 to 3).foreach { i =>
      t(s"model re-resolution (coarse + codebooks), run $i") {
        graft.operators.Clustering.loadCentroids(spark, wv(6))
        Similarity.loadPqBooks(spark, wv(7))
      }
    }
    // keep the compiler honest about unused imports
    val _ = (Dedup.CompactMaxFilesPerBucket, Multimodal.PhashMaxHamming)
    wv.foreach(tb => graft.core.ModelTables.dropBothLayers(spark, tb))
    TextAnalysis.bm25GenDropAll(spark, "r20gen")
    spark.stop()
  }
}
