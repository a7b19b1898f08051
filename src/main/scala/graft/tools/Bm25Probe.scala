package graft.tools

import org.apache.spark.sql.functions._
import graft.operators.TextAnalysis

/** Dev probe for the postings-layout decision: times a NARROW search (one
  * standing query, ≤4 terms — the interactive shape) against the
  * canonical bucketed index vs a token-SORTED bucketed twin. The theory
  * for sorting (parquet min/max row-group skipping under the pushed
  * term filter) does NOT survive measurement at 20x: per-bucket files
  * hold a single row group at this scale, so there is nothing to skip,
  * and the sorted write fragments buckets into more files — sorted
  * measured 1.83 s steady vs 1.26 s unsorted on the same narrow search.
  * That measurement is why [[TextAnalysis.persistBm25Index]] writes
  * UNSORTED buckets; this probe stays around to re-litigate the layout
  * if bucket files ever span many row groups.
  *
  * Usage: runMain graft.tools.Bm25Probe [dir]   (default /tmp/graft20x)
  */
object Bm25Probe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/graft20x")
    val spark = graft.core.EngineSession.create("local[32]", 32)
    spark.sparkContext.setLogLevel("WARN")
    TextAnalysis.persistBm25Index(spark, dir)
    val d = TextAnalysis.bm25Corpus(spark, dir)
    TextAnalysis.bm25PostingsDf(d)
      .write.mode("overwrite").bucketBy(16, "token").sortBy("token")
      .saveAsTable("bm25_probe_sorted")
    val narrow = TextAnalysis.bm25QueriesOf(d).filter(col("query_id") === 0)
    def time(tag: String, postings: String): Unit = {
      val runs = (1 to 3).map { _ =>
        spark.catalog.clearCache(); System.gc()
        val t0 = System.nanoTime()
        TextAnalysis.bm25SearchAgainst(spark, narrow, postingsTable = postings)
          .write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[bm25probe] $tag cold=${runs.head}%.2f s steady=${runs.tail.min}%.2f s")
    }
    time("unsorted", TextAnalysis.Bm25PostingsTable)
    time("sorted  ", "bm25_probe_sorted")
    spark.sql("DROP TABLE IF EXISTS bm25_probe_sorted")
    spark.stop()
  }
}
