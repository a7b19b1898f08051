package graft.tools

import org.apache.spark.sql.functions._
import graft.operators.{Clustering, Similarity}

/** Fixed-query-set 20x probe for the ANN operators whose benchmark query
  * set is defined as 5% OF THE CORPUS (`vec_id % 20 == 0`). Under
  * `StressProbe`, those operators show the family's highest ratios (PQ
  * 6.2x, multi-probe LSH 5.8x at 20x) — but total probe volume there is
  * queries × probed-corpus, i.e. quadratic in corpus size BY QUERY-SET
  * CONSTRUCTION, not an operator property. This probe holds the query set
  * fixed (the replica-0 ids, `vec_id % 20 == 0 AND vec_id < 2000` — the
  * exact sf0.1 query vectors, present verbatim in the 20x data because
  * Stress20x offsets replica ids upward) and scales only the corpus: the
  * measured ratio then isolates per-query cost, which must be ~linear in
  * the probed-list/bucket size.
  *
  * Usage: runMain graft.tools.FixedQueryStress   (after Stress20x wrote
  * /tmp/graft20x)
  */
object FixedQueryStress {
  def main(args: Array[String]): Unit = {
    val dirs = Seq("sf0.1" -> "/root/testdata/sf0.1", "20x" -> "/tmp/graft20x")
    val spark = graft.core.EngineSession.create("local[32]", 32)
    spark.sparkContext.setLogLevel("WARN")
    val fixedQueries = col("vec_id") % 20 === 0 && col("vec_id") < 2000
    val ops: Seq[(String, String => org.apache.spark.sql.DataFrame)] = Seq(
      "sim_pq_topk(fixed-q)" -> { dir =>
        Similarity.persistPqModel(spark, dir)
        Similarity.pqTopkAgainstWhere(spark, dir, Clustering.KmeansModelTable,
          Similarity.PqModelTable, Similarity.NProbe, fixedQueries)
      },
      "sim_multiprobe(fixed-q)" -> { dir =>
        Similarity.multiprobeTopkRadiusWhere(spark, dir,
          Similarity.ProbeRadius, fixedQueries)
      },
      // same construction issue as ANN: the standard BM25 query set is
      // every 37th DOCUMENT, so StressProbe's 20x ratio compounds 20x
      // queries × 20x postings. Fixing the query ids (present verbatim in
      // the 20x data) isolates per-search cost, which must scale with the
      // searched terms' postings (~20x), not the query-set size.
      "txt_phrase(fixed-q)" -> { dir =>
        graft.operators.TextAnalysis.phraseSearchWhere(spark, dir,
          col("doc_id") < 5000)
      },
      "txt_snippet(fixed-q)" -> { dir =>
        graft.operators.TextAnalysis.snippetWhere(spark, dir,
          col("doc_id") < 5000)
      },
      // bounded percolation with the standing set pinned to the replica-0
      // seeds (present verbatim at 20x): arriving volume grows 20x, the
      // standing set doesn't, so the measured ratio isolates per-doc
      // match-and-score cost — and the score bound keeps emission at the
      // alertable rows instead of queries x matches
      "txt_percolate(fixed-standing)" -> { dir =>
        graft.operators.TextAnalysis.bm25PercolateBoundedWhere(spark, dir,
          col("doc_id") < 5000)
      },
      "txt_bm25(fixed-q)" -> { dir =>
        import graft.operators.TextAnalysis
        TextAnalysis.persistBm25Index(spark, dir)
        // reuse the operator's own query derivation so the probe can never
        // silently measure a different query convention than the gated op
        TextAnalysis.bm25SearchAgainst(spark,
          TextAnalysis.bm25QueriesOf(TextAnalysis.bm25Corpus(spark, dir))
            .filter(col("query_id") < 5000))
      },
      // forget family: run 1 pays build + forget ("cold" = the physical
      // deletion rewrite, expected ~20x — it IS an index pass); runs 2-3
      // the post-forget fixed-query search, which must scale like the
      // plain indexed search
      "bm25_forget(fixed-q)" -> { dir =>
        graft.operators.TextAnalysis.bm25ForgetWhere(spark, dir,
          col("query_id") < 5000)
      },
      "hard_neg(fixed-q)" -> { dir =>
        Similarity.hardNegativesWhere(spark, dir, fixedQueries)
      },
      // fuzzy decontamination with the eval suite pinned to replica-0:
      // the corpus side's signature build scales ~20x (one shuffle), the
      // band join's bench side stays fixed
      "fuzzy_contam(fixed-bench)" -> { dir =>
        graft.operators.Training.contaminationFuzzyWhere(spark, dir,
          col("doc_id") < 5000)
      })
    // optional comma-separated substring filter over op names
    val only = args.headOption.map(_.split(",").map(_.trim).filter(_.nonEmpty))
    val selected = ops.filter { case (n, _) => only.forall(_.exists(n.contains)) }
    // warm JIT off the clock
    selected.foreach { case (_, fn) =>
      try fn("/root/testdata/sf0.01").write.format("noop").mode("overwrite").save()
      catch { case e: Throwable => System.err.println(s"[fixedq] warm failed: ${e.getMessage}") }
    }
    for ((name, fn) <- selected) {
      val t = dirs.map { case (tag, dir) =>
        val runs = (1 to 3).map { _ =>
          spark.catalog.clearCache(); System.gc()
          val t0 = System.nanoTime()
          fn(dir).write.format("noop").mode("overwrite").save()
          (System.nanoTime() - t0) / 1e9
        }
        println(f"[fixedq] $name $tag%-6s cold=${runs.head}%.2f s steady=${runs.tail.min}%.2f s")
        tag -> runs
      }.toMap
      println(f"[fixedq] $name RATIO cold=${t("20x").head / t("sf0.1").head}%.1fx " +
        f"steady=${t("20x").tail.min / t("sf0.1").tail.min}%.1fx")
    }
    spark.stop()
  }
}
